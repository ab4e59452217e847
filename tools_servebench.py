"""Serving-path benchmark: exported StableHLO artifacts at bench shapes.

Exports the flagship InterNet/HRNet eval forward with ``tools/export.py``
(params baked in, Pallas fast paths embedded when exporting on TPU),
reloads it with NO model code (``load_exported``), and measures:

- ``throughput``: bs8 argmax->one-hot feedback rollout through the
  per-window artifact (the r4 row);
- ``latency``: bs1 per-frame latency — the rollout scan is sequentially
  dependent, so scan-amortized per-iter time IS the true serving latency
  per generated frame (no relay-RTT pollution);
- ``rollout``: the WHOLE autoregressive cycgen product (reference
  mini_test sliding window, InterTrainer.py:786-856) exported as ONE
  StableHLO artifact via ``export_rollout`` and timed end to end.

Usage: python tools_servebench.py [--mode all|throughput|latency|rollout]
       [--bs 8] [--hw 512,1024] [--iters 10]
Prints one JSON line per row.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def _setup(h, w, b):
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
        train_coarse=True, coarse_model="HRNet", compute_dtype="bfloat16",
        input_h=h, input_w=w, batch_size=b, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    rgb = jnp.zeros((b, h, w, 6), jnp.bfloat16)
    seg = jnp.zeros((b, h, w, 40), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)
    return cfg, model, variables, rgb


def _time_best(fn, n=3):
    fn()  # compile + warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def bench_forward_artifact(h, w, b, iters, tag):
    """Per-window artifact driven by a host-side feedback scan."""
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.tools.export import (
        export_forward,
        load_exported,
    )

    cfg, model, variables, rgb = _setup(h, w, b)
    path = os.path.join(tempfile.gettempdir(), f"dvie_serve_{b}_{h}x{w}.hlo")
    export_forward(cfg, variables, path, model=model)
    size_mb = os.path.getsize(path) / 1e6
    fn = load_exported(path)

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
        (final, _), _ = jax.lax.scan(step, (rgb, seg_ids), None,
                                     length=iters)
        return jnp.sum(final[0].astype(jnp.float32))

    seg_ids = jnp.zeros((b, h, w), jnp.uint8)
    best = _time_best(lambda: float(loop(rgb, seg_ids)))
    per_iter_ms = best / iters * 1e3
    row = {
        "metric": ("serving_artifact_interp_fps" if tag == "throughput"
                   else "serving_bs1_latency_ms"),
        "value": (round(b * iters / best, 2) if tag == "throughput"
                  else round(per_iter_ms, 2)),
        "unit": ("frames/sec/chip" if tag == "throughput"
                 else "ms/frame (sequential rollout latency)"),
        "config": f"bs{b}_{h}x{w}_bfloat16_stablehlo",
        "artifact_mb": round(size_mb, 1),
    }
    if tag == "latency":
        row["fps_at_bs1"] = round(b * iters / best, 2)
    print(json.dumps(row))


def bench_rollout_artifact(h, w, b, iters):
    """The whole N-frame rollout as ONE artifact."""
    import jax
    import jax.numpy as jnp

    from deep_video_interpolation_extrapolation_tpu.tools.export import (
        export_rollout,
        load_exported,
    )

    cfg, model, variables, rgb = _setup(h, w, b)
    path = os.path.join(tempfile.gettempdir(),
                        f"dvie_roll{iters}_{b}_{h}x{w}.hlo")
    export_rollout(cfg, variables, path, steps=iters, model=model)
    size_mb = os.path.getsize(path) / 1e6
    fn = load_exported(path)
    seg_ids = jnp.zeros((b, h, w), jnp.uint8)

    def run():
        frames, ids = fn(rgb, seg_ids)
        jax.block_until_ready((frames, ids))

    best = _time_best(run)
    print(json.dumps({
        "metric": "serving_rollout_artifact_fps",
        "value": round(b * iters / best, 2),
        "unit": "frames/sec/chip",
        "config": f"bs{b}_{h}x{w}_x{iters}frames_bfloat16_stablehlo",
        "artifact_mb": round(size_mb, 1),
        "wall_s_per_rollout": round(best, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=("all", "throughput", "latency", "rollout"))
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=str, default="512,1024")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    if args.mode in ("all", "throughput"):
        bench_forward_artifact(h, w, args.bs, args.iters, "throughput")
    if args.mode in ("all", "latency"):
        bench_forward_artifact(h, w, 1, args.iters, "latency")
    if args.mode in ("all", "rollout"):
        bench_rollout_artifact(h, w, args.bs, args.iters)


if __name__ == "__main__":
    main()
