"""Fused width-packed BasicBlock in HWNC form: one kernel per block.

``out = lrelu(conv2(lrelu(conv1(x))) + x)`` (the HRNet BasicBlock,
reference nets/HRNet.py:15-44) computed in a single VMEM pass over
logical (H, Wp, B, fC) row-major tiles — the layout form in which Pallas
kernel IO costs zero relayout copies inside the packed-conv chains (see
ops/pallas_ae_conv.py's HWNC notes).

Motivation: after the per-conv HWNC A+E kernels the branch-0 BasicBlock
chains run 2 kernels per block, writing and re-reading the intermediate
``h1 = lrelu(conv1(x))`` through HBM — at 8x512x1024 bf16 that round
trip is ~1.07 GB (~1.3 ms) per block, times 8 blocks across stage2/3.
This kernel keeps h1 in VMEM: conv1 computes ``th+2`` output rows (a
1-row halo of recompute on each side, exact because the halo rows use
real neighbor data), conv2 consumes them, and only the block output
leaves.  Both convs run the A+E split (6 instead of 9 (fC x fO) dots;
ops/packed_conv.ae_kernels_3x3).  The input halo (th+4 rows) arrives via
cross-program double-buffered DMA (program i starts i+1's copies);
clamped out-of-image rows are zero-masked in-kernel (SAME padding), and
the h1 rows that fall outside the image are zeroed before conv2 (its own
SAME padding).

Ships default-OFF (DVIE_BB_FUSED=1 to enable): the r2 TPU A/B measured
35.27 fps vs 35.64 base at 8x512x1024 bf16 — LOSES to the per-conv A+E
form (docs/ABLOG_r2.md).  Kept as a tested perf-ledger entry.
Differentiable via custom_vjp against the XLA packed reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
    ae_kernels_3x3,
    pack_kernel_3x3,
)
from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
    _edge_kernel,
    _shift_cells,
)

_DN2 = (((1,), (0,)), ((), ()))


def _lrelu(v):
    return jnp.where(v.astype(jnp.float32) >= 0, v,
                     jnp.asarray(0.2, v.dtype) * v)


def _ae_conv_rows(win, a, e, split, n_out):
    """A+E packed 3x3 over ``n_out`` output rows of ``win``
    (n_out+2, Wp, B, fC); returns the f32 accumulator (m, fO)."""
    wp, b, fc = win.shape[1], win.shape[2], win.shape[3]
    m = n_out * wp * b
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, fc), 3)
    acc = None
    for ky in range(3):
        rows = win[ky:ky + n_out]
        d = jax.lax.dot_general(rows.reshape(m, fc), a[ky], _DN2,
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
        # E operand: lanes [split:] carry the PREV cell's rows, lanes
        # [:split] the NEXT cell's (ops/pallas_ae_conv._edge_kernel layout)
        msel = jnp.where(lane >= split, _shift_cells(rows, -1),
                         _shift_cells(rows, 1))
        acc = acc + jax.lax.dot_general(msel.reshape(m, fc), e[ky], _DN2,
                                        preferred_element_type=jnp.float32)
    return acc


def _bb_kernel(x_ref, a1_ref, e1_ref, a2_ref, e2_ref, out_ref, scr, sems, *,
               th, n_blocks, split):
    i = pl.program_id(0)
    h = n_blocks * th

    def copies(slot, q):
        s = q * th
        return (
            pltpu.make_async_copy(
                x_ref.at[pl.ds(s, th)],
                scr.at[slot, pl.ds(2, th)], sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s - 2, 0, h - 1), 1)],
                scr.at[slot, pl.ds(0, 1)], sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s - 1, 0, h - 1), 1)],
                scr.at[slot, pl.ds(1, 1)], sems.at[slot, 2]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s + th, 0, h - 1), 1)],
                scr.at[slot, pl.ds(th + 2, 1)], sems.at[slot, 3]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s + th + 1, 0, h - 1), 1)],
                scr.at[slot, pl.ds(th + 3, 1)], sems.at[slot, 4]),
        )

    @pl.when(i == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(i + 1 < n_blocks)
    def _():
        for c in copies((i + 1) % 2, i + 1):
            c.start()

    for c in copies(i % 2, i):
        c.wait()
    win = scr[i % 2]                          # (th+4, Wp, B, fC)

    # clamped halo rows duplicate the border row; the duplicates are
    # exactly the out-of-image taps — zero them (conv1's SAME padding).
    # win row j holds input row s-2+j: invalid iff j<2 at i==0 or
    # j>=th+2 at i==n_blocks-1.
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1, 1), 0)
    win = jnp.where((i == 0) & (row < 2), 0.0, win)
    win = jnp.where((i == n_blocks - 1) & (row >= th + 2), 0.0, win)

    wp, b, fc = win.shape[1], win.shape[2], win.shape[3]
    # conv1 over th+2 output rows (1-row halo each side for conv2)
    acc1 = _ae_conv_rows(win, a1_ref[...], e1_ref[...], split, th + 2)
    h1 = _lrelu(acc1).astype(out_ref.dtype).reshape(th + 2, wp, b, fc)
    # conv2's SAME padding: h1 rows outside the image are zero
    hrow = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1, 1), 0)
    h1 = jnp.where((i == 0) & (hrow == 0), 0.0, h1)
    h1 = jnp.where((i == n_blocks - 1) & (hrow == th + 1), 0.0, h1)

    acc2 = _ae_conv_rows(h1, a2_ref[...], e2_ref[...], split, th)
    out = acc2.astype(out_ref.dtype).reshape(th, wp, b, fc)
    out_ref[...] = _lrelu(out + win[2:th + 2])


def _pick_th(h: int) -> int:
    import os

    order = (4, 8, 2)
    env = os.environ.get("DVIE_BB_TH")
    if env:
        order = (int(env),) + order
    for th in order:
        if th and h % th == 0 and h // th >= 2:
            return th
    return 0


def bb_fits(x: jnp.ndarray, f: int = 2) -> bool:
    """x logical (H, Wp, B, fC)."""
    h, wp, b, fc = x.shape
    th = _pick_th(h)
    return (f == 2 and fc % 128 == 0 and th > 0
            and (wp * b * th) % 8 == 0)


def _impl(x, k1, k2, f=2, interpret=False):
    h, wp, b, fc = x.shape
    th = _pick_th(h)
    n_blocks = h // th
    dt = x.dtype
    split = (f - 1) * k1.shape[2]
    a1 = ae_kernels_3x3(k1, f)[0][:, 0].astype(dt)
    e1 = _edge_kernel(k1, f).astype(dt)
    a2 = ae_kernels_3x3(k2, f)[0][:, 0].astype(dt)
    e2 = _edge_kernel(k2, f).astype(dt)

    kern = functools.partial(_bb_kernel, th=th, n_blocks=n_blocks,
                             split=split)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  w_spec, w_spec, w_spec, w_spec],
        out_specs=pl.BlockSpec((th, wp, b, fc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wp, b, fc), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wp, b, fc), dt),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=interpret,
        **kwargs,
    )(x, a1, e1, a2, e2)


def _ref(x, k1, k2, f=2):
    """XLA packed-conv reference (identical math, HWNC dimension nums)."""
    dt = x.dtype

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, pack_kernel_3x3(k, f).astype(dt), (1, 1), "SAME",
            dimension_numbers=("HWNC", "HWIO", "HWNC"),
            preferred_element_type=dt)

    h1 = _lrelu(conv(x, k1))
    return _lrelu(conv(h1, k2) + x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_basicblock_hwnc(x, k1, k2, f=2, interpret=False):
    """lrelu(conv2(lrelu(conv1(x))) + x) on HWNC f-packed tiles; see above.

    x (H, Wp, B, f*C) logical; k1, k2 (3, 3, C, C) logical HWIO.
    """
    return _impl(x, k1, k2, f, interpret)


def _fwd(x, k1, k2, f, interpret):
    return fused_basicblock_hwnc(x, k1, k2, f, interpret), (x, k1, k2)


def _bwd(f, interpret, res, g):
    x, k1, k2 = res
    _, vjp = jax.vjp(lambda a, b, c: _ref(a, b, c, f), x, k1, k2)
    return vjp(g)


fused_basicblock_hwnc.defvjp(_fwd, _bwd)
