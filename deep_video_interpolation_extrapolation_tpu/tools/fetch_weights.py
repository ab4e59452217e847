"""Checksum-pinned pretrained-weight fetch + convert (VGG19, ResNet101).

The perceptual VGG loss (losses/perceptual.py; reference losses.py:157-207
via nets/vgg.py:5-55) and TrackObjLoss (reference losses.py:362-414 via
nets/resnet101.py:5-21) need torchvision's ImageNet weights for ABSOLUTE
parity with the reference.  This build environment has zero egress, so
the weights cannot be fetched here — the converters and their parity
tests exist (models/features.py, tests/test_features_parity.py) but run
on random weights.  This script closes the gap the moment egress exists:

    python -m deep_video_interpolation_extrapolation_tpu.tools.fetch_weights \
        [--dest ~/.cache/dvie_weights] [--only vgg19|resnet101]

For each model it (1) downloads the pinned torchvision checkpoint,
(2) verifies the SHA-256 prefix that torchvision's own filename encodes,
(3) converts through the verified porters into our parameter trees, and
(4) saves an .npz the runtime loads via ``load_pretrained``.  Offline it
fails gracefully per-model with a clear message and nonzero exit.

URLs + hashes are torchvision's published ones (the 8-hex filename
suffix is the SHA-256 prefix torchvision itself verifies against).
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import urllib.request

PINNED = {
    "vgg19": {
        "url": "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
        "sha256_prefix": "dcbb9e9d",
    },
    "resnet101": {
        "url": "https://download.pytorch.org/models/resnet101-63fe2227.pth",
        "sha256_prefix": "63fe2227",
    },
}


def _flatten(tree, prefix=""):
    import jax
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[prefix + key] = leaf
    return flat


def _download(url: str, sha256_prefix: str, timeout: int = 300) -> bytes:
    req = urllib.request.Request(url, headers={"User-Agent": "dvie-tpu"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        data = r.read()
    digest = hashlib.sha256(data).hexdigest()
    if not digest.startswith(sha256_prefix):
        raise RuntimeError(
            f"checksum mismatch for {url}: sha256={digest[:16]}..., "
            f"expected prefix {sha256_prefix}")
    return data


def fetch_vgg19(dest: str) -> str:
    import jax
    import numpy as np
    import torch

    from deep_video_interpolation_extrapolation_tpu.models.features import (
        VGG19Features,
        load_torch_vgg19_state,
    )

    data = _download(**PINNED["vgg19"])
    sd = torch.load(io.BytesIO(data), map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
    params = VGG19Features().init(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 32, 32, 3)))
    ported = load_torch_vgg19_state(params, sd)
    out = os.path.join(dest, "vgg19_imagenet.npz")
    np.savez(out, **{k: np.asarray(v) for k, v in _flatten(ported).items()})
    return out


def fetch_resnet101(dest: str) -> str:
    import jax
    import numpy as np
    import torch

    from deep_video_interpolation_extrapolation_tpu.models.features import (
        ResNet101Features,
        load_torch_resnet101_state,
    )

    data = _download(**PINNED["resnet101"])
    sd = torch.load(io.BytesIO(data), map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items() if not k.startswith("fc.")}
    variables = ResNet101Features().init(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 64, 64, 3)), train=False)
    ported = load_torch_resnet101_state(variables, sd)
    out = os.path.join(dest, "resnet101_imagenet.npz")
    np.savez(out, **{k: np.asarray(v) for k, v in _flatten(ported).items()})
    return out


def load_pretrained(npz_path: str, template):
    """Rehydrate a saved .npz into the template's tree structure."""
    import jax
    import numpy as np
    data = np.load(npz_path)
    flat = _flatten(template)
    missing = [k for k in flat if k not in data.files]
    if missing:
        raise KeyError(f"{npz_path} missing {len(missing)} keys, "
                       f"e.g. {missing[:3]}")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    keys = list(_flatten(template).keys())
    return jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(data[k]) for k in keys])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default=os.path.expanduser("~/.cache/dvie_weights"))
    ap.add_argument("--only", choices=["vgg19", "resnet101"], default=None)
    args = ap.parse_args(argv)
    os.makedirs(args.dest, exist_ok=True)

    jobs = {"vgg19": fetch_vgg19, "resnet101": fetch_resnet101}
    if args.only:
        jobs = {args.only: jobs[args.only]}
    failed = []
    for name, fn in jobs.items():
        try:
            out = fn(args.dest)
            print(f"{name}: saved {out}")
        except Exception as e:  # offline / checksum / conversion
            failed.append(name)
            print(f"{name}: FAILED ({type(e).__name__}: {e}) — "
                  "this environment may have no egress; re-run when "
                  "network access exists.", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
