"""Dump the optimized HLO of the bench forward loop (for layout forensics).

Usage: python tools_hlo.py [--out /tmp/bench_hlo.txt] [--batch 8]
Compile is served from the persistent cache when warm.
"""

from __future__ import annotations

import argparse


def main(out: str, batch: int):
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
        (final, _), _ = jax.lax.scan(step, (rgb, seg), None, length=4)
        return jnp.sum(final.astype(jnp.float32))

    compiled = jax.jit(forward_loop).lower(rgb, seg).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "chars")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_hlo.txt")
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()
    main(a.out, a.batch)
