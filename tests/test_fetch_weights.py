"""fetch_weights: offline graceful failure + npz save/load roundtrip.

The real download path needs egress this environment lacks; what we CAN
pin is (a) the CLI fails gracefully (per-model message, nonzero exit, no
partial files left behind as importable artifacts), and (b) the
save-tree -> npz -> load_pretrained roundtrip is exact, so the moment a
checkpoint IS fetched the runtime side is already proven.
"""

import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.tools import fetch_weights


def test_offline_fails_gracefully(tmp_path, monkeypatch, capsys):
    def no_net(url, sha256_prefix, timeout=300):
        raise OSError("network unreachable")
    monkeypatch.setattr(fetch_weights, "_download", no_net)
    rc = fetch_weights.main(["--dest", str(tmp_path)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "vgg19: FAILED" in err and "resnet101: FAILED" in err
    assert list(tmp_path.iterdir()) == []


def test_checksum_rejects_corrupt_payload(monkeypatch):
    class FakeResp:
        def __init__(self):
            self._data = b"corrupt bytes"

        def read(self):
            return self._data

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(fetch_weights.urllib.request, "urlopen",
                        lambda req, timeout: FakeResp())
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        fetch_weights._download("https://example.invalid/x.pth", "dcbb9e9d")


def test_npz_roundtrip_exact(tmp_path):
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.models.features import (
        VGG19Features,
    )

    params = VGG19Features().init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    out = tmp_path / "vgg.npz"
    np.savez(out, **{k: np.asarray(v)
                     for k, v in fetch_weights._flatten(params).items()})
    loaded = fetch_weights.load_pretrained(str(out), params)
    orig = jax.tree_util.tree_leaves(params)
    back = jax.tree_util.tree_leaves(loaded)
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_keys_raise(tmp_path):
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.models.features import (
        VGG19Features,
    )

    params = VGG19Features().init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    flat = fetch_weights._flatten(params)
    some = dict(list(flat.items())[:3])
    out = tmp_path / "partial.npz"
    np.savez(out, **{k: np.asarray(v) for k, v in some.items()})
    with pytest.raises(KeyError):
        fetch_weights.load_pretrained(str(out), params)
