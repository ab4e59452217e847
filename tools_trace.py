"""Trace the bench forward on the real TPU and aggregate per-op device time.

Runs the same InterNet/HRNet 1024x512 bf16 scan loop as bench.py under
``jax.profiler.trace``, then parses the generated ``*.trace.json.gz``
(traceEvents; TPU device pid) and prints per-op totals with XLA's
``model_flops``/``bytes_accessed`` annotations — the ground-truth
breakdown (the cumulative-prefix profiler tools_profile.py misattributes
via dead-code elimination; see README perf notes).

Usage:
    python tools_trace.py [--iters 4] [--out /tmp/dvie_trace] [--top 60]
    python tools_trace.py --parse-only --out /tmp/dvie_trace
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def run_trace(out_dir: str, iters: int, batch: int = 8) -> None:
    import jax
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry

    enable_compilation_cache()
    h, w = 512, 1024
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

    @jax.jit
    def forward_loop(rgb, seg):
        def step(carry, _):
            cur_rgb, cur_seg = carry
            out_rgb, out_seg = model.apply(variables, cur_rgb, cur_seg,
                                           train=False)
            nxt_rgb = jnp.concatenate(
                [out_rgb, out_rgb], axis=-1).astype(cur_rgb.dtype)
            oh = jax.nn.one_hot(
                jnp.argmax(out_seg, -1), 20, dtype=cur_seg.dtype)
            nxt_seg = jnp.concatenate([oh, oh], axis=-1)
            return (nxt_rgb, nxt_seg), None
        (final, _), _ = jax.lax.scan(step, (rgb, seg), None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    float(forward_loop(rgb, seg))  # compile + warm
    with jax.profiler.trace(out_dir):
        float(forward_loop(rgb, seg))
    print("trace written to", out_dir)


_FUSION = re.compile(r"^(\%?[\w\.\-]+)")


def parse_trace(out_dir: str, top: int, iters: int):
    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    assert paths, f"no trace under {out_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device pids: process_name metadata containing 'TPU'
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "pjrt" not in name.lower():
                dev_pids.add(e["pid"])
    rows = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "")
        args = e.get("args", {})
        # skip container/run events
        if name.startswith(("Steps", "pjit", "jit_")) or "run_id" in name:
            continue
        total += dur
        r = rows[name]
        r[0] += dur
        r[1] += 1
        try:
            r[2] += float(args.get("model_flops", args.get("flops", 0)) or 0)
        except (TypeError, ValueError):
            pass
        try:
            r[3] += float(args.get("bytes_accessed", 0) or 0)
        except (TypeError, ValueError):
            pass
        if not r[4]:
            r[4] = str(args.get("long_name", args.get("tf_op", "")))[:220]
    print(f"\ntotal device time: {total:.1f} ms over {iters} iters "
          f"=> {total / iters:.1f} ms/iter")
    print(f"{'ms/iter':>8} {'%':>5} {'n':>4} {'TF/s':>6} {'GB/s':>6}  name")
    items = sorted(rows.items(), key=lambda kv: -kv[1][0])
    for name, (dur, n, flops, byts, long_name) in items[:top]:
        tfs = flops / (dur * 1e-3) / 1e12 if dur else 0
        gbs = byts / (dur * 1e-3) / 1e9 if dur else 0
        print(f"{dur / iters:8.2f} {100 * dur / total:5.1f} {n:4d} "
              f"{tfs:6.1f} {gbs:6.1f}  {name[:80]}")
        if long_name:
            print(f"{'':32}{long_name[:180]}")
    return rows, total


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/dvie_trace")
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--parse-only", action="store_true")
    a = ap.parse_args()
    if not a.parse_only:
        run_trace(a.out, a.iters, a.batch)
    parse_trace(a.out, a.top, a.iters)
