"""Host input-pipeline throughput bench (measurement tooling, repo root).

Measures end-to-end Loader batches/sec on a real on-disk PNG tree —
decode + augment + collate, no device work — so the host side of the
load/comp split (reference InterTrainer.py:375-381) can be quantified
and A/B'd:

  python tools_loaderbench.py --bs 8 --hw 128,128 --nw 4
  python tools_loaderbench.py --bs 8 --hw 512,1024 --src-h 512 --src-w 1024 \\
      --nw 4 --native 0        # PIL/numpy pipeline
  python tools_loaderbench.py ... --native 1   # fused C kernels (default)

Prints ONE JSON line: {"metric": "loader_batches_per_sec", ...} plus the
derived frames/sec (3 frames per sample) and ms/batch.  The synthetic
tree is generated once under --tree (default /tmp/dvie_loaderbench) and
reused; pass --regen to rebuild.

Measurement note: this rig has ONE host core — numbers are only
comparable on an otherwise-idle box (a concurrent pytest run skews
results 2-3x), and --nw > 0 cannot speed up pure decode there (it exists
to OVERLAP host work with device steps, which this host-only bench does
not model).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_tree(root: str, n_clips: int, src_h: int, src_w: int) -> None:
    from PIL import Image

    from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
        IMG_EXT,
        SEG_EXT,
    )

    rng = np.random.RandomState(0)
    for c in range(n_clips):
        for i in range(3):
            rel = f"train/scene/clip{c}_{i:06d}"
            p = os.path.join(root, "imgs", rel + IMG_EXT)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            # smooth gradient + noise: PNG filter/deflate behavior close to
            # natural images (pure noise over-penalizes decode)
            yy, xx = np.mgrid[0:src_h, 0:src_w]
            base = (yy * 255 // max(src_h, 1) + xx * 255 // max(src_w, 1)) // 2
            img = np.clip(
                base[..., None] + rng.randint(-20, 20, (src_h, src_w, 3)),
                0, 255).astype(np.uint8)
            Image.fromarray(img).save(p)
            q = os.path.join(root, "segs", rel + SEG_EXT)
            os.makedirs(os.path.dirname(q), exist_ok=True)
            seg = (base // 13 % 20).astype(np.uint8)
            Image.fromarray(seg).save(q)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", default="128,128",
                    help="crop h,w (model input size)")
    ap.add_argument("--src-h", type=int, default=150)
    ap.add_argument("--src-w", type=int, default=150)
    ap.add_argument("--nw", type=int, default=4)
    ap.add_argument("--native", type=int, default=1)
    ap.add_argument("--n-clips", type=int, default=64)
    ap.add_argument("--batches", type=int, default=0,
                    help="batches to time (0 = one epoch)")
    ap.add_argument("--tree", default="/tmp/dvie_loaderbench")
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    os.environ["DVIE_NATIVE_LOADER"] = "1" if args.native else "0"

    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.data.folder import (
        ClipDataset,
        Loader,
    )
    from deep_video_interpolation_extrapolation_tpu.native import host

    ch, cw = (int(v) for v in args.hw.split(","))
    tree = f"{args.tree}_{args.src_h}x{args.src_w}_{args.n_clips}"
    marker = os.path.join(tree, ".complete")
    if args.regen or not os.path.exists(marker):
        build_tree(tree, args.n_clips, args.src_h, args.src_w)
        open(marker, "w").close()

    cfg = Config(runner="INTER", model="InterNet", syn_type="inter",
                 mode="xs2xs", split="train", input_h=ch, input_w=cw,
                 batch_size=args.bs, dataset="cityscape",
                 num_track_per_img=4)
    clips = [[f"train/scene/clip{c}_{i:06d}" for i in range(3)]
             for c in range(args.n_clips)]
    ds = ClipDataset(cfg, clips, split="train",
                     img_dir=os.path.join(tree, "imgs"),
                     seg_dir=os.path.join(tree, "segs"),
                     src_size=max(args.src_h, args.src_w))
    loader = Loader(ds, args.bs, seed=0, num_workers=args.nw)

    # warm one batch (thread-pool spin-up, native lib build)
    next(iter(loader))

    n_target = args.batches or len(loader)
    done = 0
    t0 = time.perf_counter()
    while done < n_target:
        for batch in loader:
            done += 1
            if done >= n_target:
                break
        loader.set_epoch(loader.epoch + 1)
    dt = time.perf_counter() - t0

    bps = done / dt
    print(json.dumps({
        "metric": "loader_batches_per_sec",
        "value": round(bps, 3),
        "unit": "batches/s",
        "frames_per_sec": round(bps * args.bs * 3, 1),
        "ms_per_batch": round(1e3 * dt / done, 2),
        "config": (f"bs{args.bs}_{ch}x{cw}_src{args.src_h}x{args.src_w}"
                   f"_nw{args.nw}_native{int(bool(args.native))}"),
        "native_available": host.available(),
        "batches": done,
    }))


if __name__ == "__main__":
    main()
