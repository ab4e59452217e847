"""Benchmark: flagship interpolation throughput on one TPU chip.

Measures InterNet (HRNet coarse, the reference's primary interpolation
model, runners/InterTrainer.py:31-34) inference throughput at full
Cityscapes resolution 1024x512 in bfloat16 — the BASELINE.json north-star
metric ("Cityscapes 1024x512 interpolation ... frames/sec/chip").

Baseline note: the reference publishes no numbers (SURVEY §6).
``REF_GPU_FPS_ESTIMATE`` is a MEASURED-anchored estimate of the PyTorch
reference's 1024x512 HRNet forward rate on its actual training hardware
(GTX 1080 Ti class 11GB, reference cmd:160-162), produced by
tools_refbench.py (docs/REFBENCH.json):

- exact FLOPs, hook-counted on the reference's own torch model:
  **2777.7 GFLOPs/frame** (scale-invariant checked at 128x128; the
  round-1/2 "~200 GFLOPs" hand estimate was 14x low),
- activation traffic 22.85 GB/frame fp32,
- roofline on published 1080 Ti specs (11.34 TFLOP/s fp32, 484 GB/s):
  compute-bound; speed-of-light fps = 2.04 at 50% conv efficiency,
  central = 1.73 at the measured torch conv-vs-GEMM efficiency (0.42,
  oneDNN on this host, a transferable cuDNN proxy), lower = 0.86.

``vs_baseline`` divides by the CENTRAL estimate (1.73); dividing by the
speed-of-light bound (2.04) instead would scale every claim by 0.85.
The >=10x north-star corresponds to vs_baseline >= 10 with ~2x headroom
against even the most generous reference bound.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

# frames/sec, reference torch HRNet @1024x512 on 1080 Ti — measured-anchored
# central estimate, range [0.86, 2.04]; see docstring + docs/REFBENCH.json
REF_GPU_FPS_ESTIMATE = 1.73


def main():
    import jax
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry

    enable_compilation_cache()

    h, w = 512, 1024
    batch = 8
    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="bfloat16",
        input_h=h, input_w=w, batch_size=batch, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    rgb = jnp.zeros((batch, h, w, 6), jnp.bfloat16)
    seg = jnp.zeros((batch, h, w, 40), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)

    iters = 10

    # The whole timed loop lives inside ONE jit: on this rig every
    # synchronous device round trip costs ~30 ms (HTTP relay), so per-call
    # host timing would measure the tunnel, not the chip.  Scanning the
    # forward `iters` times and reading back one scalar amortizes it away.
    @jax.jit
    def forward_loop(rgb, seg_ids):
        def step(carry, _):
            cur_rgb, cur_ids = carry
            # the rollout carries uint8 class ids and one-hots on entry —
            # the framework's host<->device / feedback contract
            # (train/common.seg_oh, the cycgen mini_test rollout).  A
            # 40-channel one-hot carry costs a 2.2 ms/iter relayout copy
            # on the scan boundary (r2c trace, copy.512).
            oh = jax.nn.one_hot(cur_ids, 20, dtype=cur_rgb.dtype)
            cur_seg = jnp.concatenate([oh, oh], axis=-1)
            out_rgb, out_seg = model.apply(variables, cur_rgb, cur_seg,
                                           train=False)
            nxt_rgb = jnp.concatenate(
                [out_rgb, out_rgb], axis=-1).astype(cur_rgb.dtype)
            # feed the predicted seg back too so the seg-encoder stays inside
            # the measured loop (a constant seg would be hoisted out)
            nxt_ids = jnp.argmax(out_seg, -1).astype(jnp.uint8)
            return (nxt_rgb, nxt_ids), None
        (final, _), _ = jax.lax.scan(
            step, (rgb, seg_ids), None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    seg_ids = jnp.zeros((batch, h, w), jnp.uint8)
    # warmup + compile
    float(forward_loop(rgb, seg_ids))

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(forward_loop(rgb, seg_ids))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    fps = batch * iters / best

    print(json.dumps({
        "metric": "internet_hrnet_interp_fps_1024x512_bf16",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REF_GPU_FPS_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    import os
    import subprocess
    import sys

    if os.environ.get("DVIE_BENCH_CHILD"):
        main()
        sys.exit(0)

    # The axon relay can refuse/disconnect transiently (backed-up compiles
    # from killed jobs surface as UNAVAILABLE backend-init errors) and has
    # been observed fully down for an hour+.  Retry for up to ~30 min so a
    # flaky window doesn't record a benchless round.  Each attempt is a
    # fresh subprocess: jax caches a failed backend init for the life of
    # the process, so in-process retries can never recover from one.
    env = dict(os.environ, DVIE_BENCH_CHILD="1")
    deadline = time.monotonic() + 45 * 60
    attempt = 0
    while True:
        attempt += 1
        try:
            # per-child cap: a down relay can hang a fresh interpreter at
            # start (sitecustomize backend registration), not just error
            res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 timeout=30 * 60)
        except subprocess.TimeoutExpired:
            print(f"bench: child hung (attempt {attempt})", file=sys.stderr)
            if time.monotonic() >= deadline:
                sys.exit(1)
            continue
        sys.stderr.write(res.stderr)
        if res.returncode == 0:
            sys.stdout.write(res.stdout)
            break
        retryable = ("UNAVAILABLE" in res.stderr or "UNAVAILABLE" in res.stdout
                     or "Unable to initialize backend" in res.stderr)
        if not retryable or time.monotonic() >= deadline:
            sys.stdout.write(res.stdout)
            sys.exit(res.returncode or 1)
        print(f"bench: backend unavailable (attempt {attempt}), "
              "retrying in 120s", file=sys.stderr)
        time.sleep(120)
