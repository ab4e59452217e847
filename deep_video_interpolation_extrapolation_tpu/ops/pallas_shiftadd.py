"""Standalone Pallas 9-way shifted-add for taps-in-N head outputs.

``ops/tapped_conv.taps_shifted_add`` finishes the dual-head 3x3 by
summing 9 spatially-shifted tap blocks of the (B, H, W, 9*co) tensor the
fused upshead kernel writes.  Its XLA form slices over a 5-D
(B, H, W, 9, co) view, whose (9, co)-minor tiling forces a measured
6.0 ms relayout copy of the kernel output at 8x512x1024 co=23
(copy.357/363 in the r3/r4 traces) before the 2.7 ms add itself; the
flat-lane-slice alternative was A/B'd ~10 ms SLOWER (tapped_conv.py
docstring).

This kernel instead reads the taps tensor in its producer's OWN
row-major block form (zero retile), extracts tap t by a lane ROLL of
co*t and a final [..., :co] slice (f32 rolls probed legal on TPU,
_probe_laneroll.py; the identical bf16 rolls hit a Mosaic compile bug,
hence the f32 accumulate), and resolves the +-1-row halo with the
one-tile-delay finalize of ops/pallas_upshead._kernel_fold: program i
buffers tile i and finalizes OUTPUT tile i-1 from
[carry row | tile i-1 | first row of tile i]; grid (B, ni+1), zero
recompute, zero extra reads.

MEASURED VERDICT (r4, real v5e, bench config 8x512x1024 co=23):
**35.21 fps vs 36.34** with the XLA composition — the 8 non-power-of-2
lane rolls (207 lanes, multi-op VPU shuffles each) out-cost the 8.7 ms
of copies they replace.  Third losing alternative for this tail (after
the flat-lane slices, ~10 ms slower, and the in-kernel fold, -2.7 fps):
copy.357 + fusion.1030 is the measured optimum.  Kept opt-in
(DVIE_SHIFTADD=1, models/hrnet._finish_taps) with tests as the recorded
refutation.

Bias is folded in (the callers add it right after).  Differentiable via
custom_vjp against the f32-accumulated XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8


def _shift_px(a, s):
    """result[:, x] = a[:, x+s] with zero edges (s in {-1, 0, +1}); dim 1
    is the pixel dim.  Positive rolls + wrap masking (sublane slices at
    offset 1 carry layouts Mosaic cannot concat)."""
    if s == 0:
        return a
    S = a.shape[1]
    r = pltpu.roll(a, (-s) % S, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
    edge = S - 1 if s == 1 else 0
    return jnp.where(col == edge, 0.0, r)


def _kernel(yt_ref, b2_ref, out_ref, buf, carry, *, th: int, ni: int,
            co: int):
    i = pl.program_id(1)

    @pl.when(i < ni)
    def _stage():
        buf[i % 2] = yt_ref[0]

    @pl.when(i == ni)
    def _pad():
        # bottom zero pad: the final tile's ky=+1 taps read conv padding
        buf[i % 2] = jnp.zeros_like(buf[i % 2])

    @pl.when(i >= 1)
    def _finalize():
        n = buf.shape[-1]
        ytp = buf[(i - 1) % 2].astype(jnp.float32)       # tile i-1
        top = jnp.where(i == 1, 0.0, carry[...].astype(jnp.float32))
        first_cur = buf[i % 2][0:1].astype(jnp.float32)
        ytw = jnp.concatenate([top, ytp, first_cur], axis=0)
        acc = None
        for ky in range(3):
            rows = ytw[ky:ky + th]
            for kx in range(3):
                t = ky * 3 + kx
                sh = _shift_px(rows, kx - 1)
                if t:
                    sh = pltpu.roll(sh, (n - co * t) % n, axis=2)
                acc = sh if acc is None else acc + sh
        out = acc[..., :co] + b2_ref[...].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)
        carry[...] = ytp[th - 1:th].astype(carry.dtype)


def _impl(yt, b2, interpret=False):
    import os

    b, h, w, n = yt.shape
    co = b2.shape[0]
    assert n == 9 * co, (n, co)
    th = TH
    env = os.environ.get("DVIE_SHIFTADD_TH")
    if env and int(env) >= 2 and h % int(env) == 0:
        th = int(env)
    ni = h // th
    dt = yt.dtype
    kern = functools.partial(_kernel, th=th, ni=ni, co=co)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(b, ni + 1),
        in_specs=[
            pl.BlockSpec((1, th, w, n),
                         lambda bi, i: (bi, jnp.minimum(i, ni - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co),
            lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th, w, n), dt),
            pltpu.VMEM((1, w, n), dt),
        ],
        interpret=interpret,
        **kwargs,
    )(yt, b2.reshape(1, -1).astype(jnp.float32))


def _ref(yt, b2):
    """XLA reference, f32-accumulated like the kernel (and like
    tapped_conv.taps_shifted_add's consumers observe to bf16 rounding)."""
    co = b2.shape[0]
    B, H, W, n = yt.shape
    yt5 = yt.reshape(B, H, W, 9, co).astype(jnp.float32)
    ytp = jnp.pad(yt5, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            sl = jax.lax.slice(
                ytp, (0, ky, kx, t, 0),
                (B, ky + H, kx + W, t + 1, co))[..., 0, :]
            out = sl if out is None else out + sl
    return (out + b2.astype(jnp.float32)).astype(yt.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def shifted_add_bias(yt, b2, interpret=False):
    """9-way shifted add + bias over a (B, H, W, 9*co) taps tensor in its
    producer's row-major form; returns (B, H, W, co).  See module doc."""
    return _impl(yt, b2, interpret=interpret)


def _fwd(yt, b2, interpret):
    return shifted_add_bias(yt, b2, interpret), (yt, b2)


def _bwd(interpret, res, g):
    _, vjp = jax.vjp(_ref, *res)
    return vjp(g)


shifted_add_bias.defvjp(_fwd, _bwd)


def fits(yt, co: int) -> bool:
    b, h, w, n = yt.shape
    return n == 9 * co and h % TH == 0 and h // TH >= 2 and w >= 128
