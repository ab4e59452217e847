"""Fused HRNet stage fuse-out0 kernel: lrelu(y0 + up2x(t1) [+ up4x(t2)]).

The full-resolution branch-0 fuse sum (reference nets/HRNet.py:202-227,
fuse_layers i=0) is the hottest pure-bandwidth region after the heads: at
8x512x1024 bf16 the XLA composition costs ~30+ ms/step across both stages
— depthwise-convT upsamplers that run at ~220 GB/s with interleaved
writes (fusion.825/843/846 in the round-2 trace), the sum+lrelu fusions at
~340 GB/s reading three mixed-layout operands, the branch-0 unpack
relayout copies, and (between stages) a pack relayout for the next
packed block chain.  Its wall is ~4 ms of HBM streaming.

This kernel reads the width-packed branch-0 block output (B,H,W/2,2C),
DMAs 1-halo slabs of the fuse-conv outputs t1 (B,H/2,W/2,C) and optionally
t2 (B,H/4,W/4,C), bilinearly upsamples them on the VPU in f32 (the
phase-blend machinery of ops/pallas_upshead.py — rows are untiled, column
phases are whole-lane-block blends in the packed layout), adds, lrelus,
and writes out0 ONCE — width-packed (B,H,W/2,2C) for a following packed
branch chain (stage2 -> stage3) or unpacked (B,H,W,C) for the head stage.
Upsample convention = ops/resize.interpolate_bilinear(align_corners=False)
exactly (half-pixel; edge-clamped via host-side edge padding).

Differentiable via custom_vjp against the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8    # output rows per program
WT = 32   # output f4-cells per program (= 128 px)


def _kernel(y0_ref, t1_ref, t2_ref, out_ref, s1, sems, *,
            th: int, wt: int, ni: int, nj: int, total: int,
            has_t2: bool, packed_out: bool):
    p = (pl.program_id(0) * ni + pl.program_id(1)) * nj + pl.program_id(2)

    # t1 (128-lane, f2-packed) halo slabs via cross-program double-buffered
    # DMA; t2 (64-lane) arrives as host-materialized overlapping windows
    # through a pipelined BlockSpec — manual DMA slices need 128-aligned
    # lane dims (Mosaic: "Slice shape along dimension 3 must be aligned to
    # tiling (128), but is 64")
    def dma(slot, q):
        bi = q // (ni * nj)
        r = q % (ni * nj)
        ti = r // nj
        tj = r % nj
        return pltpu.make_async_copy(
            t1_ref.at[bi, pl.ds(ti * (th // 2), th // 2 + 2),
                      pl.ds(tj * wt, wt + 16)],
            s1.at[slot], sems.at[slot])

    @pl.when(p == 0)
    def _():
        dma(0, p).start()

    @pl.when(p + 1 < total)
    def _():
        dma((p + 1) % 2, p + 1).start()

    dma(p % 2, p).wait()
    # ---- x2 upsample of t1 (f2-packed: lanes = [phase0 C | phase1 C]),
    # phase math identical to ops/pallas_upshead.py (align_corners=False)
    v1 = s1[p % 2].astype(jnp.float32)               # (th/2+2, wt+16, 2C)
    rows = []
    for r in range(th):
        a = r // 2 + 1
        if r % 2 == 0:
            rows.append(0.25 * v1[a - 1] + 0.75 * v1[a])
        else:
            rows.append(0.75 * v1[a] + 0.25 * v1[a + 1])
    u1 = jnp.stack(rows)                             # (th, wt+16, 2C)
    c = u1.shape[-1] // 2
    ph0, ph1 = u1[:, :, :c], u1[:, :, c:]
    s_cells = u1.shape[1]
    cm1_p1 = pltpu.roll(ph1, 1, axis=1)[:, 8:8 + wt]
    c_p0 = ph0[:, 8:8 + wt]
    c_p1 = ph1[:, 8:8 + wt]
    cp1_p0 = pltpu.roll(ph0, s_cells - 1, axis=1)[:, 8:8 + wt]
    acc = jnp.concatenate([
        0.25 * cm1_p1 + 0.75 * c_p0,
        0.75 * c_p0 + 0.25 * c_p1,
        0.25 * c_p0 + 0.75 * c_p1,
        0.75 * c_p1 + 0.25 * cp1_p0,
    ], axis=-1)                                      # (th, wt, 4C) f4-packed

    if has_t2:
        v2 = t2_ref[0, 0, 0].astype(jnp.float32)     # (th/4+2, wt+16, C)
        rows = []
        wts = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125),
               (0.625, 0.375))
        for r in range(th):
            a = r // 4 + 1
            w_lo, w_hi = wts[r % 4]
            if r % 4 < 2:
                rows.append(w_lo * v2[a - 1] + w_hi * v2[a])
            else:
                rows.append(w_lo * v2[a] + w_hi * v2[a + 1])
        u2 = jnp.stack(rows)                         # (th, wt+16, C)
        cm1 = pltpu.roll(u2, 1, axis=1)[:, 8:8 + wt]
        cc = u2[:, 8:8 + wt]
        cp1_ = pltpu.roll(u2, u2.shape[1] - 1, axis=1)[:, 8:8 + wt]
        acc = acc + jnp.concatenate([
            0.375 * cm1 + 0.625 * cc,
            0.125 * cm1 + 0.875 * cc,
            0.875 * cc + 0.125 * cp1_,
            0.625 * cc + 0.375 * cp1_,
        ], axis=-1)                                  # f4-packed

    # y0 arrives as an f4-packed (th, wt, 4C) block (the host reshapes the
    # f2-packed array to (B,H,W/4,4C) — a free row-major view) and the
    # output leaves in the same f4 form, reshaped back host-side:
    # in-kernel lane reshapes next to loads/stores hit Mosaic's
    # infer-vector-layout "unsupported shape cast" (probed: both the f32
    # and bf16 (8,32,256)->(8,128,64) forms abort)
    y0 = y0_ref[0].astype(jnp.float32)
    acc = acc + y0
    acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def fits(y0p: jnp.ndarray, t1: jnp.ndarray) -> bool:
    b, h, wp, c2 = y0p.shape
    w = 2 * wp
    # w % 4 == 0: _impl views the f2-packed input as f4 cells
    # (reshape (B,H,W/2,2C) -> (B,H,W/4,4C)), which needs an even W/2 —
    # an odd wp (W ≡ 2 mod 4) passed the (w//4) floor-division check but
    # crashed the reshape
    return (c2 == 128 and h % TH == 0 and w % 4 == 0
            and (w // 4) % 8 == 0
            and t1.shape[1] == h // 2 and t1.shape[2] == w // 2)


def _impl(y0p, t1, t2, packed_out, interpret=False):
    b, h, wp, c2 = y0p.shape
    c = c2 // 2
    w = 2 * wp
    w4 = w // 4
    th, wt = TH, WT
    while w4 % wt:
        wt //= 2
    assert h % th == 0 and wt >= 8, (h, w)
    ni, nj = h // th, w4 // wt
    dt = y0p.dtype
    has_t2 = t2 is not None

    # edge-pad + f2-pack t1 (pad BEFORE packing: cell -1 phase 1 must clamp
    # to logical column 0); t2 becomes overlapping per-tile windows built
    # with STATIC slices (a dynamic_slice gather lowers ~50 ms/step)
    t1p = jnp.pad(t1, ((0, 0), (1, 1), (16, 16), (0, 0)), mode="edge")
    t1p = t1p.reshape(b, h // 2 + 2, w4 + 16, 2 * c)
    if has_t2:
        t2p = jnp.pad(t2, ((0, 0), (1, 1), (8, 8), (0, 0)), mode="edge")
        rows = jnp.stack(
            [t2p[:, i * (th // 4):i * (th // 4) + th // 4 + 2]
             for i in range(ni)], axis=1)       # (b, ni, th/4+2, w4+16, c)
        t2w = jnp.stack(
            [rows[:, :, :, j * wt:j * wt + wt + 16] for j in range(nj)],
            axis=2)                             # (b, ni, nj, th/4+2, wt+16, c)
    else:
        t2w = jnp.zeros((b, ni, nj, th // 4 + 2, wt + 16, c), dt)

    kern = functools.partial(_kernel, th=th, wt=wt, ni=ni, nj=nj,
                             total=b * ni * nj, has_t2=has_t2,
                             packed_out=packed_out)
    # f2-packed (B,H,W/2,2C) -> f4 view (B,H,W/4,4C): free row-major
    # reshape; ditto the output on the way back
    y0f4 = y0p.reshape(b, h, w4, 4 * c)
    out = pl.pallas_call(
        kern,
        grid=(b, ni, nj),
        in_specs=[
            pl.BlockSpec((1, th, wt, 4 * c),
                         lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, th // 4 + 2, wt + 16, c),
                         lambda bi, i, j: (bi, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wt, 4 * c),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w4, 4 * c), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 2, wt + 16, 2 * c), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(y0f4, t1p, t2w)
    if packed_out:
        return out.reshape(b, h, wp, 2 * c)
    return out.reshape(b, h, w, c)


def _ref(y0p, t1, t2, packed_out):
    """XLA reference: unpack + bilinear upsample + sum + lrelu (+ repack)."""
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_w,
        unpack_w,
    )
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )
    y0 = unpack_w(y0p, 2)
    size = y0.shape[1:3]
    s = y0.astype(jnp.float32) + interpolate_bilinear(
        t1, size=size, align_corners=False).astype(jnp.float32)
    if t2 is not None:
        s = s + interpolate_bilinear(
            t2, size=size, align_corners=False).astype(jnp.float32)
    s = jnp.where(s >= 0, s, 0.2 * s).astype(y0p.dtype)
    return pack_w(s, 2) if packed_out else s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_out0(y0p, t1, t2, packed_out=False, interpret=False):
    """lrelu(unpack(y0p) + up2x(t1) [+ up4x(t2)]), one VMEM pass.

    y0p (B,H,W/2,2C) width-packed branch-0 output; t1 (B,H/2,W/2,C) fuse
    conv output; t2 (B,H/4,W/4,C) or None.  Returns f2-packed
    (B,H,W/2,2C) when ``packed_out`` else (B,H,W,C).
    """
    return _impl(y0p, t1, t2, packed_out, interpret=interpret)


def _fwd(y0p, t1, t2, packed_out, interpret):
    return fused_out0(y0p, t1, t2, packed_out, interpret), (y0p, t1, t2)


def _bwd(packed_out, interpret, res, g):
    y0p, t1, t2 = res
    if t2 is None:
        _, vjp = jax.vjp(lambda a, b: _ref(a, b, None, packed_out), y0p, t1)
        da, db = vjp(g)
        return da, db, None
    _, vjp = jax.vjp(lambda a, b, c_: _ref(a, b, c_, packed_out),
                     y0p, t1, t2)
    return vjp(g)


fused_out0.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# HWNC f2 variant (stage2 -> stage3 boundary).
#
# The NHWC/f4 kernel above pays three retile copies at 8x512x1024 bf16:
# its y0 input needs {3,0,2,1} -> {3,2,1,0} (~1.6 ms), the host f2->f4
# view retiles 128 -> 256 lanes (~1.7 ms), and the packed output retiles
# back f4 -> f2 for the next stage's chain (~1.6 ms).  In logical
# (H, W2, B, C) form every boundary is bit-identical to the {3,0,2,1}
# physical layout of the producing/consuming packed convs, and the kernel
# stays in f2 the whole way: out cell i maps 1:1 to t1 column i (lanes =
# [even-px C | odd-px C]), so the x2 phase blends are plain lane concats
# of W-shifted t1 rows, and the x4 blends use a host-side column-repeat
# view of t2 plus a cell-parity select.  Upsampling's edge clamp falls out
# of the halo DMA's row clamping — no host pads at all.
# ---------------------------------------------------------------------------


def _edge_shift(a, s):
    """Edge-clamped W-shift on (rows, W, B, C): result[:, w] = a[:, w+s]
    with the border column duplicated (align_corners=False clamp)."""
    if s == 1:
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _kernel_hwnc(y0_ref, t1_ref, t2_ref, out_ref, *,
                 th: int, n_blocks: int, has_t2: bool):
    # t1/t2 arrive as host-materialized overlapping row windows through
    # pipelined BlockSpecs: manual DMA of the 64-lane tensors is rejected
    # by Mosaic ("Slice shape along dimension 3 must be aligned to tiling
    # (128), but is 64" — the same constraint that shaped the NHWC
    # kernel's t2 path), and the windows' edge-clamped halo rows ARE the
    # bilinear edge clamp.
    v1 = t1_ref[0].astype(jnp.float32)        # (th/2+2, W2, B, C)
    rows = []
    for r in range(th):
        a = r // 2 + 1
        if r % 2 == 0:
            rows.append(0.25 * v1[a - 1] + 0.75 * v1[a])
        else:
            rows.append(0.75 * v1[a] + 0.25 * v1[a + 1])
    u1 = jnp.stack(rows)                      # (th, W2, B, C) row-blended
    # out cell i lanes [0:C] = even px 2i <- 0.25*t1[i-1] + 0.75*t1[i];
    # lanes [C:2C] = odd px 2i+1 <- 0.75*t1[i] + 0.25*t1[i+1]
    acc = jnp.concatenate([
        0.25 * _edge_shift(u1, -1) + 0.75 * u1,
        0.75 * u1 + 0.25 * _edge_shift(u1, 1),
    ], axis=-1)                               # (th, W2, B, 2C) f2

    if has_t2:
        v2 = t2_ref[0].astype(jnp.float32)    # (th/4+2, W2, B, C) col-repeated
        rows = []
        wts = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125),
               (0.625, 0.375))
        for r in range(th):
            a = r // 4 + 1
            w_lo, w_hi = wts[r % 4]
            if r % 4 < 2:
                rows.append(w_lo * v2[a - 1] + w_hi * v2[a])
            else:
                rows.append(w_lo * v2[a] + w_hi * v2[a + 1])
        u2 = jnp.stack(rows)                  # (th, W2, B, C)
        sm1 = _edge_shift(u2, -1)
        sp1 = _edge_shift(u2, 1)
        # rep[i] = t2[i//2]: even cell i holds phases (0,1) of source col
        # i/2, odd holds (2,3) of (i-1)/2 — select blends by cell parity
        even = (jax.lax.broadcasted_iota(
            jnp.int32, (1, u2.shape[1], 1, 1), 1) % 2) == 0
        acc = acc + jnp.concatenate([
            jnp.where(even, 0.375 * sm1 + 0.625 * u2,
                      0.875 * u2 + 0.125 * sp1),
            jnp.where(even, 0.125 * sm1 + 0.875 * u2,
                      0.625 * u2 + 0.375 * sp1),
        ], axis=-1)

    acc = acc + y0_ref[...].astype(jnp.float32)
    acc = jnp.where(acc >= 0, acc, 0.2 * acc)
    out_ref[...] = acc.astype(out_ref.dtype)


# HWNC blocks carry the WHOLE batch (B is an inner layout dim); bound
# the per-program tile bytes so large batches fall back to the NHWC /
# XLA compositions instead of blowing VMEM (same failure class as the
# r3 batch-sweep ae_conv OOM).  Resident per program: y0 tile + out tile
# (th*w2*b*c2 each) + t1/t2 windows.  Validated envelope (stage2 fuse0
# @8x512x1024 f2, th=4): ~12.6 MiB.
_F0_BUDGET = 32 * 2**20


def _pick_th_hwnc(h: int, w2: int = 0, b: int = 0, c2: int = 0,
                  esz: int = 2) -> int:
    import os

    order = (4, 8, 16)
    env = os.environ.get("DVIE_FUSE0_TH")
    if env:
        order = (int(env),) + order
    for th in order:
        if not (th % 4 == 0 and h % th == 0 and h // th >= 2):
            continue
        if w2:
            c = c2 // 2
            est = (2 * th * c2 + (th // 2 + 2) * c + (th // 4 + 2) * c
                   ) * w2 * b * esz
            if est > _F0_BUDGET:
                continue
        return th
    return 0


def fits_hwnc(y0: jnp.ndarray, t1: jnp.ndarray) -> bool:
    """y0 logical (H, W2, B, 2C) f2; t1 (H/2, W/2, B, C)."""
    h, w2, b, c2 = y0.shape
    esz = jnp.dtype(y0.dtype).itemsize
    # b % 8: B is the second-minor dim of the (8,128)-tiled HWNC layout;
    # Mosaic rejects memref slices with a non-8-aligned B extent (the
    # bs12 sweep failure in the sibling ae_conv kernel).
    return (c2 % 128 == 0 and b % 8 == 0
            and _pick_th_hwnc(h, w2, b, c2, esz) > 0
            and t1.shape[:3] == (h // 2, w2, b)
            and t1.shape[3] == c2 // 2)


def _impl_hwnc(y0, t1, t2, interpret=False):
    h, w2, b, c2 = y0.shape
    c = c2 // 2
    th = _pick_th_hwnc(h, w2, b, c2, jnp.dtype(y0.dtype).itemsize)
    n_blocks = h // th
    dt = y0.dtype
    has_t2 = t2 is not None

    if has_t2:
        # rep[i] = t2[i//2]: a contiguous row-major view (B, C minor are
        # untouched), so XLA lowers it to a cheap broadcast
        h4, w4 = t2.shape[0], t2.shape[1]
        rep = jnp.broadcast_to(t2[:, :, None], (h4, w4, 2, b, c)
                               ).reshape(h4, 2 * w4, b, c)
    else:
        rep = jnp.zeros((h // 4, w2, b, c), dt)

    def windows(src, rows_per):
        """(R, W2, B, C) -> (n_blocks, rows_per+2, W2, B, C) overlapping
        row windows, edge-duplicated halos (STATIC slices + stack — a
        dynamic_slice gather lowers catastrophically)."""
        srcp = jnp.concatenate([src[:1], src, src[-1:]], axis=0)
        return jnp.stack([
            jax.lax.slice_in_dim(srcp, q * rows_per,
                                 q * rows_per + rows_per + 2, axis=0)
            for q in range(n_blocks)])

    t1w = windows(t1.astype(dt), th // 2)
    t2w = windows(rep.astype(dt), th // 4)

    kern = functools.partial(_kernel_hwnc, th=th, n_blocks=n_blocks,
                             has_t2=has_t2)

    def tile(cc):
        return pl.BlockSpec((th, w2, b, cc), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def wspec(rows):
        return pl.BlockSpec((1, rows + 2, w2, b, c),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[tile(c2), wspec(th // 2), wspec(th // 4)],
        out_specs=tile(c2),
        out_shape=jax.ShapeDtypeStruct((h, w2, b, c2), dt),
        interpret=interpret,
        **kwargs,
    )(y0.astype(dt), t1w, t2w)


def _ref_hwnc(y0, t1, t2):
    """XLA reference through the (free) HWNC<->NHWC transposes."""
    to_n = lambda a: jnp.transpose(a, (2, 0, 1, 3))
    out = _ref(to_n(y0), to_n(t1), None if t2 is None else to_n(t2), True)
    return jnp.transpose(out, (1, 2, 0, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_out0_hwnc(y0, t1, t2, interpret=False):
    """lrelu(y0 + up2x(t1) [+ up4x(t2)]) on HWNC f2 tiles; see above.

    y0 (H, W2, B, 2C) f2-packed HWNC; t1 (H/2, W/2, B, C);
    t2 (H/4, W/4, B, C) or None.  Returns f2-packed (H, W2, B, 2C).
    """
    return _impl_hwnc(y0, t1, t2, interpret=interpret)


def _fwd_hwnc(y0, t1, t2, interpret):
    return fused_out0_hwnc(y0, t1, t2, interpret), (y0, t1, t2)


def _bwd_hwnc(interpret, res, g):
    y0, t1, t2 = res
    if t2 is None:
        _, vjp = jax.vjp(lambda a, b: _ref_hwnc(a, b, None), y0, t1)
        da, db = vjp(g)
        return da, db, None
    _, vjp = jax.vjp(_ref_hwnc, y0, t1, t2)
    return vjp(g)


fused_out0_hwnc.defvjp(_fwd_hwnc, _bwd_hwnc)
