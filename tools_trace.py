"""Trace the bench forward on the real TPU and aggregate per-op device time.

Runs the same InterNet/HRNet 1024x512 bf16 scan loop as bench.py under
``jax.profiler.trace``, then parses the generated ``*.trace.json.gz``
(traceEvents; TPU device pid) and prints per-op totals with XLA's
``model_flops``/``bytes_accessed`` annotations — the ground-truth
breakdown (the cumulative-prefix profiler tools_profile.py misattributes
via dead-code elimination; see README perf notes).

Usage:
    python tools_trace.py [--iters 4] [--out /tmp/dvie_trace] [--top 60]
    python tools_trace.py --train [--hw 512,1024] [--batch 8]
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


def run_trace(out_dir: str, iters: int, batch: int = 8,
              highres_large: bool = False) -> None:
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
        highres_large=highres_large,
    )
    model = registry.build_model(cfg)
    rgb = jnp.zeros((batch, h, w, 6), jnp.bfloat16)
    seg = jnp.zeros((batch, h, w, 40), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)

    @jax.jit
    def forward_loop(rgb, seg_ids):
        def step(carry, _):
            cur_rgb, cur_ids = carry
            # uint8 id carry + on-entry one-hot — keep identical to
            # bench.py so traces attribute the same program
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

    seg_ids = jnp.zeros((batch, h, w), jnp.uint8)
    float(forward_loop(rgb, seg_ids))  # compile + warm
    with jax.profiler.trace(out_dir):
        float(forward_loop(rgb, seg_ids))
    print("trace written to", out_dir)


def run_trace_train(out_dir: str, iters: int, batch: int,
                    h: int = 512, w: int = 1024) -> None:
    """Trace the full InterNet train step (fwd + bwd + Adamax update) —
    the breakdown the backward-pass kernel work needs.  Hoist-proof: the
    scan carries the train state, so params change every iteration and no
    model compute is loop-invariant."""
    import jax
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter,
        state as state_lib,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        init_vgg_frozen,
    )

    enable_compilation_cache()
    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="bfloat16",
        input_h=h, input_w=w, batch_size=batch, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    dt = registry.compute_dtype(cfg)
    rgb = jnp.zeros((batch, h, w, 6), dt)
    seg = jnp.zeros((batch, h, w, 40), dt)
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = jax.jit(model.init, static_argnames=["train"])(
        k0, rgb, seg, train=True)
    frozen = ({} if not cfg.vgg_weight else {"vgg": init_vgg_frozen(cfg, k1)})
    state = state_lib.create_train_state(cfg, variables, frozen=frozen)
    batch_d = {
        "frame1": jax.random.uniform(k2, (batch, h, w, 3), jnp.float32, -1, 1),
        "frame2": jax.random.uniform(k2, (batch, h, w, 3), jnp.float32, -1, 1),
        "frame3": jax.random.uniform(k2, (batch, h, w, 3), jnp.float32, -1, 1),
        "seg1": jax.nn.one_hot(jnp.zeros((batch, h, w), jnp.int32), 20),
        "seg2": jax.nn.one_hot(jnp.zeros((batch, h, w), jnp.int32), 20),
        "seg3": jax.nn.one_hot(jnp.zeros((batch, h, w), jnp.int32), 20),
    }
    step = inter.make_train_step(cfg, model)

    @jax.jit
    def loop(state, batch, rng):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st, losses = step(st, batch, sub)
            return (st, key), losses["loss_all"]
        (st, _), ls = jax.lax.scan(body, (state, rng), None, length=iters)
        return st, jnp.sum(ls)

    st, s = loop(state, batch_d, jax.random.PRNGKey(1))
    float(s)  # compile + warm
    with jax.profiler.trace(out_dir):
        _, s = loop(state, batch_d, jax.random.PRNGKey(1))
        float(s)
    print("train trace written to", out_dir)


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
    ap.add_argument("--train", action="store_true",
                    help="trace the full train step instead of the forward")
    ap.add_argument("--highres-large", action="store_true",
                    help="trace the 4-branch --highres_large forward")
    ap.add_argument("--hw", default="512,1024")
    a = ap.parse_args()
    if not a.parse_only:
        if a.train:
            h, w = (int(v) for v in a.hw.split(","))
            run_trace_train(a.out, a.iters, a.batch, h, w)
        else:
            run_trace(a.out, a.iters, a.batch,
                      highres_large=a.highres_large)
    parse_trace(a.out, a.top, a.iters)
