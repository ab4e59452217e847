"""Per-component in-loop profile of the HRNet forward at 8x512x1024 bf16.

Measures cumulative prefixes of the backbone (stem -> layer1 -> transition1
-> stage2 -> transition2 -> stage3 -> upsample-concat -> heads) inside a
scan-amortized jit loop (same methodology as bench.py: a scalar derived
from the output perturbs the next iteration's input, so nothing is
hoisted; one scalar readback per timed call).  Successive diffs give the
per-component cost.

Usage: python tools_profile.py [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.cache import (
    enable_compilation_cache,
)
from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.models import hrnet as hrnet_lib
from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Bottleneck, Conv, SegEncoder, lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
)

import flax.linen as nn


class _Prefix(nn.Module):
    """Backbone prefix up to `stage` (reuses the real submodule classes so
    param structure/naming matches _HRBackbone where shared)."""
    stage: int  # 1=stem 2=layer1 3=trans1 4=stage2 5=trans2 6=stage3 7=ups 8=heads
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, rgb, seg):
        seg_enc = SegEncoder(dtype=self.dtype)
        x = hrnet_lib._encode_inputs(rgb, seg, seg_enc)
        if self.stage == 0:
            return x
        f = 2 if (jax.default_backend() == "tpu" and x.shape[2] % 2 == 0
                  and x.shape[2] >= 256) else 0
        if f:
            from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                pack_w, unpack_w,
            )
            x = pack_w(x, f)
        x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f, name="conv1")(x))
        x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f, name="conv2")(x))
        if self.stage == 1:
            return x
        for i in range(4):
            x = Bottleneck(64, dtype=self.dtype, packed_io=f,
                           name=f"layer1_{i}")(x)
        if self.stage == 2:
            return x
        xs = hrnet_lib._Transition(
            (256,), hrnet_lib.STAGE2_CFG["num_channels"], dtype=self.dtype,
            packed_in=f, name="transition1")([x])
        if self.stage == 3:
            return xs[0]
        xs = hrnet_lib.HighResolutionModule(
            dtype=self.dtype, name="stage2", branch0_packed=bool(f),
            **hrnet_lib.STAGE2_CFG)(xs)
        if self.stage == 4:
            return xs[0]
        xs = hrnet_lib._Transition(
            hrnet_lib.STAGE2_CFG["num_channels"],
            hrnet_lib.STAGE3_CFG["num_channels"],
            dtype=self.dtype, name="transition2")(xs)
        if self.stage == 5:
            return xs[0]
        xs = hrnet_lib.HighResolutionModule(
            dtype=self.dtype, name="stage3", **hrnet_lib.STAGE3_CFG)(xs)
        if self.stage == 6:
            return xs[0]
        size = xs[0].shape[1:3]
        ups = [xs[0]] + [
            interpolate_bilinear(t, size=size, align_corners=False)
            for t in xs[1:]
        ]
        feat = jnp.concatenate(ups, axis=-1)
        if self.stage == 7:
            return feat
        rgb_out = hrnet_lib._Head(3, 448, dtype=self.dtype, name="rgb_layer")(feat)
        seg_out = hrnet_lib._Head(20, 448, dtype=self.dtype, name="seg_layer")(feat)
        return jnp.concatenate([rgb_out, seg_out], axis=-1)


def timed_loop(model, variables, rgb, seg, iters):
    @jax.jit
    def loop(rgb, seg):
        def step(carry, _):
            cur_rgb, s = carry
            out = model.apply(variables, cur_rgb + s, seg)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-20
            return (cur_rgb, s.astype(cur_rgb.dtype)), None
        (_, s), _ = jax.lax.scan(step, (rgb, jnp.bfloat16(0)), None,
                                 length=iters)
        return s
    float(loop(rgb, seg))  # compile+warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(rgb, seg))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def main():
    enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    b, h, w = 8, 512, 1024
    rgb = jnp.zeros((b, h, w, 6), jnp.bfloat16)
    seg = jnp.zeros((b, h, w, 40), jnp.bfloat16)
    names = ["seg-enc+input", "stem", "layer1", "transition1", "stage2",
             "transition2", "stage3", "ups-concat", "heads"]
    prev = 0.0
    for stage, name in enumerate(names):
        m = _Prefix(stage=stage)
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), rgb, seg)
        t = timed_loop(m, variables, rgb, seg, iters)
        print(f"{name:14s} cum {t*1e3:7.2f} ms   +{(t-prev)*1e3:6.2f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
