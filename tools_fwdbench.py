"""Parameterized forward-throughput bench (generalizes bench.py).

Measures InterNet/HRNet inference frames/sec/chip at an arbitrary batch,
resolution, and head config, with the same hoist-proof methodology as
bench.py: the timed loop is ONE jit containing a lax.scan whose carry
feeds each step's prediction back as the next input (any loop-invariant
input would get its whole dependent subgraph hoisted out of the measured
region — see bench.py and the rig notes in docs/).

Usage: python tools_fwdbench.py [--bs 8] [--hw 512,1024] [--iters 10]
                                [--highres-large] [--dtype bfloat16]
Prints one JSON line {"metric", "value", "unit", "config"}.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=str, default="512,1024")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--highres-large", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    import jax
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry

    enable_compilation_cache()
    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype=args.dtype,
        input_h=h, input_w=w, batch_size=args.bs, dataset="synthetic",
        highres_large=args.highres_large,
    )
    model = registry.build_model(cfg)
    b = args.bs
    dt = registry.compute_dtype(cfg)
    rgb = jnp.zeros((b, h, w, 6), dt)
    seg = jnp.zeros((b, h, w, 40), dt)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)

    iters = args.iters

    @jax.jit
    def forward_loop(rgb, seg_ids):
        def step(carry, _):
            cur_rgb, cur_ids = carry
            # uint8 id carry + on-entry one-hot: the framework's feedback
            # contract (train/common.seg_oh); a 40-ch one-hot carry costs
            # a ~2.2 ms/iter scan-boundary relayout (r2c trace, copy.512)
            oh = jax.nn.one_hot(cur_ids, 20, dtype=cur_rgb.dtype)
            cur_seg = jnp.concatenate([oh, oh], axis=-1)
            out_rgb, out_seg = model.apply(variables, cur_rgb, cur_seg,
                                           train=False)
            nxt_rgb = jnp.concatenate(
                [out_rgb, out_rgb], axis=-1).astype(cur_rgb.dtype)
            nxt_ids = jnp.argmax(out_seg, -1).astype(jnp.uint8)
            return (nxt_rgb, nxt_ids), None
        (final, _), _ = jax.lax.scan(
            step, (rgb, seg_ids), None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    seg_ids = jnp.zeros((b, h, w), jnp.uint8)
    float(forward_loop(rgb, seg_ids))  # warmup + compile

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(forward_loop(rgb, seg_ids))
        dt_s = time.perf_counter() - t0
        best = dt_s if best is None else min(best, dt_s)
    fps = b * iters / best

    print(json.dumps({
        "metric": "internet_hrnet_interp_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "config": f"bs{b}_{h}x{w}_{args.dtype}"
                  + ("_hl4" if args.highres_large else ""),
    }))


if __name__ == "__main__":
    main()
