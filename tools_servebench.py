"""Serving-path benchmark: the exported StableHLO artifact at bench shapes.

Exports the flagship InterNet/HRNet eval forward with ``tools/export.py``
(params baked in, Pallas fast paths embedded when exporting on TPU),
reloads it with NO model code (``load_exported``), and times the same
argmax->one-hot feedback rollout as ``bench.py`` through the artifact —
proving the deployment story serves at training-repo speed, something
the reference (inference = training repo + checkpoint,
runners/InterTrainer.py:786-856) cannot do at all.

Usage: python tools_servebench.py [--bs 8] [--hw 512,1024] [--iters 10]
Prints one JSON line {"metric", "value", "unit", "config", "artifact_mb"}.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=str, default="512,1024")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.tools.export import (
        export_forward,
        load_exported,
    )

    enable_compilation_cache()
    b = args.bs
    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="bfloat16",
        input_h=h, input_w=w, batch_size=b, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    rgb = jnp.zeros((b, h, w, 6), jnp.bfloat16)
    seg = jnp.zeros((b, h, w, 40), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)

    path = os.path.join(tempfile.gettempdir(), f"dvie_serve_{b}_{h}x{w}.hlo")
    export_forward(cfg, variables, path, model=model)
    size_mb = os.path.getsize(path) / 1e6

    fn = load_exported(path)

    # same hoist-proof rollout as bench.py: predicted rgb AND seg feed back
    iters = args.iters

    @jax.jit
    def loop(rgb, seg_ids):
        def step(carry, _):
            cur_rgb, cur_ids = carry
            oh = jax.nn.one_hot(cur_ids, 20, dtype=cur_rgb.dtype)
            cur_seg = jnp.concatenate([oh, oh], axis=-1)
            out_rgb, out_seg = fn(cur_rgb, cur_seg)
            nxt_rgb = jnp.concatenate(
                [out_rgb, out_rgb], axis=-1).astype(cur_rgb.dtype)
            nxt_ids = jnp.argmax(out_seg, -1).astype(jnp.uint8)
            return (nxt_rgb, nxt_ids), None
        (final, _), _ = jax.lax.scan(step, (rgb, seg_ids), None, length=iters)
        return jnp.sum(final[0].astype(jnp.float32))

    seg_ids = jnp.zeros((b, h, w), jnp.uint8)
    float(loop(rgb, seg_ids))  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(rgb, seg_ids))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    fps = b * iters / best
    print(json.dumps({
        "metric": "serving_artifact_interp_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "config": f"bs{b}_{h}x{w}_bfloat16_stablehlo",
        "artifact_mb": round(size_mb, 1),
    }))


if __name__ == "__main__":
    main()
