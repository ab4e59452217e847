"""Fused HRNet dual-head Pallas kernel.

The HRNet heads (reference nets/HRNet.py:410-442) each run
``1x1 conv (448->448) -> lrelu -> 3x3 conv (448->3|20)`` on the full-res
upsample-concat feature map.  Composed in XLA this is the single hottest
region of the forward pass (profiled on v5e): the two 448-channel
intermediates are 3.76 GB each at 8x512x1024 and make four full HBM round
trips (13.1 ms x2 for the 1x1s, 25.5 ms x2 for the tiny-cout 3x3s).

This kernel computes BOTH heads in one pass over the feature map:
- per (batch, row-tile, col-tile): DMA a 1-px-halo slab of the feature map
  into VMEM;
- h_head = lrelu(slab @ W1_head + b1) stays in VMEM (never touches HBM);
- the two heads' 3x3 convs run as ONE 9-tap matmul over
  concat(h_rgb, h_seg) (K=896) against a combined (3,3,896,128) kernel
  whose first 3 output columns are the rgb head and the next ``seg_dim``
  the seg head (output lanes pad to 128 on the MXU regardless, so packing
  both heads into one N=128 matmul is free);
- only the (B, H, W, 128) combined output is written back.

STATUS: EXPERIMENTAL — math verified (interpret mode + small-shape TPU
runs agree with the XLA composition to bf16 tolerance), but not yet wired
into HRNet: full-size TPU compiles through this rig's remote-compile relay
were too slow to converge on a final tiling this round.  Mosaic constraints
discovered and worked around along the way (useful for future kernels):
matmul accumulators must be 32-bit; reshapes merging unaligned major dims
are rejected (use 3-D dot_general); value-level dynamic_slice is not
lowered (route through scratch refs + pl.ds); minor-dim inserts on bf16
are rejected (mask in f32, cast after); DMA slices of (8,128)-tiled dims
need 8/128-aligned sizes (pad W by 4 and C to 128k host-side).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, slab, sem,
            *, tile_h: int, tile_w: int, cin: int, height: int, width: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    th, tw = tile_h, tile_w

    # W slices of a (8,128)-tiled array must be 8-aligned: the host pads W
    # by 4 each side and the slab carries a 4-px W halo (only 1 is used)
    cp = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(ti * th, th + 2), pl.ds(tj * tw, tw + 8)],
        slab, sem)
    cp.start()

    w1 = w1_ref[...]          # (448, 896) both heads' 1x1, column-concat
    b1 = b1_ref[...]          # (896,)
    w2 = w2_ref[...]          # (3, 3, 896, 128)
    b2 = b2_ref[...]          # (128,)

    cp.wait()
    # full-tile 1x1 (f32 accumulators are mandatory for tpu.matmul), lrelu
    # + SAME-pad zeroing fused, stored bf16 in scratch.  Contractions are
    # 3-D dot_generals — Mosaic rejects reshapes merging unaligned dims.
    dn = (((2,), (0,)), ((), ()))
    xs = slab[...]
    h = jax.lax.dot_general(xs, w1, dn,
                            preferred_element_type=jnp.float32) + b1
    h = jnp.where(h >= 0, h, 0.2 * h)
    r_glob = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 8), 0)
              + ti * th - 1)
    c_glob = (jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 8), 1)
              + tj * tw - 4)
    inside = ((r_glob >= 0) & (r_glob < height)
              & (c_glob >= 0) & (c_glob < width))
    hall = (h * jnp.where(inside, 1.0, 0.0)[..., None]).astype(
        slab.dtype)                        # (th+2, tw+8, c2) bf16 value

    c2 = w1.shape[1]

    # Tap loop order matters on Mosaic: slicing the COLUMN (sublane) dim at
    # +-1 is an unaligned shift (a vector roll per slice), while row slices
    # of a 3-D value are free (major dim, untiled).  So shift columns ONCE
    # per kx (3 rolls total instead of 9) and take row taps off that.
    acc = jnp.zeros((th, tw, 128), jnp.float32)
    for kx in range(3):
        hx = jax.lax.slice(hall, (0, kx + 3, 0), (th + 2, kx + 3 + tw, c2))
        for ky in range(3):
            hs = jax.lax.slice(hx, (ky, 0, 0), (ky + th, tw, c2))
            acc = acc + jax.lax.dot_general(
                hs, w2[ky, kx], dn, preferred_element_type=jnp.float32)
    out_ref[0] = (acc + b2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seg_dim", "interpret"))
def fused_dual_head(
    feat: jnp.ndarray,
    w1_rgb: jnp.ndarray, b1_rgb: jnp.ndarray,
    w2_rgb: jnp.ndarray, b2_rgb: jnp.ndarray,
    w1_seg: jnp.ndarray, b1_seg: jnp.ndarray,
    w2_seg: jnp.ndarray, b2_seg: jnp.ndarray,
    seg_dim: int = 20,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both HRNet heads over ``feat`` (B, H, W, C).

    w1_*: (C, C) 1x1 kernels; w2_rgb: (3, 3, C, 3); w2_seg: (3, 3, C, seg_dim).
    Returns (rgb (B,H,W,3), seg (B,H,W,seg_dim)).
    """
    b, h, w, c = feat.shape
    rgb_dim = w2_rgb.shape[-1]
    assert rgb_dim + seg_dim <= 128

    def pick(n, target):
        for t in range(min(target, n), 0, -1):
            if n % t == 0:
                return t
        return n
    th = pick(h, 16)
    tw = pick(w, 64)

    dt = feat.dtype
    # channel dims must be lane-aligned for the halo DMA: pad C -> 128k
    # (zeros in both the features and the matching w1 rows are exact)
    cp_ = (-c) % 128
    w1 = jnp.concatenate([w1_rgb, w1_seg], axis=1).astype(dt)      # (C, 2C)
    if cp_:
        w1 = jnp.pad(w1, ((0, cp_), (0, 0)))
    b1 = jnp.concatenate([b1_rgb, b1_seg]).astype(jnp.float32)
    c2 = w1.shape[1]
    # combined 3x3: rows 0:C act on h_rgb -> cols 0:rgb_dim; rows C:2C on
    # h_seg -> cols rgb_dim:rgb_dim+seg_dim; everything else zero
    w2 = jnp.zeros((3, 3, c2, 128), dt)
    w2 = w2.at[:, :, :c, :rgb_dim].set(w2_rgb.astype(dt))
    w2 = w2.at[:, :, c:, rgb_dim:rgb_dim + seg_dim].set(w2_seg.astype(dt))
    b2 = jnp.zeros((128,), jnp.float32)
    b2 = b2.at[:rgb_dim].set(b2_rgb.astype(jnp.float32))
    b2 = b2.at[rgb_dim:rgb_dim + seg_dim].set(b2_seg.astype(jnp.float32))

    xp = jnp.pad(feat, ((0, 0), (1, 1), (4, 4), (0, cp_)))
    cin_pad = c + cp_

    kern = functools.partial(_kernel, tile_h=th, tile_w=tw, cin=cin_pad,
                             height=h, width=w)
    out = pl.pallas_call(
        kern,
        grid=(b, h // th, w // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, 128), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 8, cin_pad), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    return out[..., :rgb_dim], out[..., rgb_dim:rgb_dim + seg_dim]
