"""Fused upsample-concat + dual-head 1x1 Pallas kernel.

The HRNet output stage (reference nets/HRNet.py:575-582,410-442) upsamples
the stage-3 pyramid (64ch @1x, 128ch @1/2, 256ch @1/4) to full resolution,
concatenates to 448 channels, and runs each head's ``1x1 conv -> lrelu``
on the 3.76 GB (8x512x1024 bf16) concat.  Composed in XLA this region is
HBM-bound at ~32% MXU utilization (profiled: ups-concat 28.7 ms + heads
75.7 ms): the upsampled parts and the concat each make full HBM round
trips, and each head re-reads the concat.

This kernel computes ``h = lrelu(concat([p0, up2x(p1), up4x(p2)]) @ W1 +
b1)`` for BOTH heads in one pass (N = 896 = 7*128, MXU-aligned), reading
each pyramid part from HBM exactly once and never materializing the
upsampled parts or the concat:

- per (batch, 8-row, 32-cell) tile: p0 arrives via a pipelined BlockSpec;
  1-halo slabs of p1 (width-packed f=2) and p2 are DMA'd manually from
  edge-padded arrays (edge padding = torch's align_corners=False clamp);
- bilinear x2/x4 upsampling runs on the VPU in f32: static per-row blends
  (rows are the untiled major dim, so row taps are free) and per-phase
  column blends in the width-packed layout (out-phase p of an f4-packed
  output cell is a fixed blend of whole 128-lane blocks — no sublane
  interleave, the classic packed-layout win, see ops/packed_conv.py);
- the three per-part contractions accumulate in f32 on the MXU
  (K = 64 | 128 | 256 against the row-split W1), bias + lrelu fuse in,
  and only the (B, H, W, 896) h tensor is written back.

Upsample weight derivation (half-pixel convention, matching
ops/resize.interpolate_bilinear(align_corners=False) exactly):
x2: out col o -> in coord o/2 - 0.25; even o: 0.25*in[i-1] + 0.75*in[i],
odd o: 0.75*in[i] + 0.25*in[i+1] (i = o//2).  x4: out o -> in o/4 - 0.375;
phase weights (0.375, 0.625), (0.125, 0.875), (0.875, 0.125),
(0.625, 0.375).

Differentiable via custom_vjp: backward = jax.vjp of the XLA reference
composition (exact same math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8    # output rows per program
WT = 32   # output f4-cells per program (= 128 px)


def _ups2x_block(v1, th: int, wt: int, dt):
    """x2 bilinear upsample of an f2-packed (th/2+2, wt+16, 2C1) f32 slab
    to an unpacked (th, 4*wt, C1) tile (shared by every kernel here;
    half-pixel weights per the module docstring)."""
    rows = []
    for r in range(th):
        a = r // 2 + 1
        if r % 2 == 0:
            rows.append(0.25 * v1[a - 1] + 0.75 * v1[a])
        else:
            rows.append(0.75 * v1[a] + 0.25 * v1[a + 1])
    u1 = jnp.stack(rows)                             # (th, wt+16, 2C1)
    c1 = u1.shape[-1] // 2
    ph0, ph1 = u1[:, :, :c1], u1[:, :, c1:]
    s_cells = u1.shape[1]
    cm1_p1 = pltpu.roll(ph1, 1, axis=1)[:, 8:8 + wt]
    c_p0 = ph0[:, 8:8 + wt]
    c_p1 = ph1[:, 8:8 + wt]
    cp1_p0 = pltpu.roll(ph0, s_cells - 1, axis=1)[:, 8:8 + wt]
    up1 = jnp.concatenate([
        0.25 * cm1_p1 + 0.75 * c_p0,
        0.75 * c_p0 + 0.25 * c_p1,
        0.25 * c_p0 + 0.75 * c_p1,
        0.75 * c_p1 + 0.25 * cp1_p0,
    ], axis=-1).astype(dt)                           # (th, wt, 4C1) f4
    return up1.reshape(th, 4 * wt, c1)


def _ups4x_block(v2, th: int, wt: int, dt):
    """x4 bilinear upsample of an unpacked (th/4+2, wt+16, C2) f32 slab
    to an unpacked (th, 4*wt, C2) tile."""
    rows = []
    wts = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125), (0.625, 0.375))
    for r in range(th):
        a = r // 4 + 1
        w_lo, w_hi = wts[r % 4]
        if r % 4 < 2:
            rows.append(w_lo * v2[a - 1] + w_hi * v2[a])
        else:
            rows.append(w_lo * v2[a] + w_hi * v2[a + 1])
    u2 = jnp.stack(rows)                             # (th, wt+16, C2)
    cm1 = pltpu.roll(u2, 1, axis=1)[:, 8:8 + wt]
    cc = u2[:, 8:8 + wt]
    cp1_ = pltpu.roll(u2, u2.shape[1] - 1, axis=1)[:, 8:8 + wt]
    up2 = jnp.concatenate([
        0.375 * cm1 + 0.625 * cc,
        0.125 * cm1 + 0.875 * cc,
        0.875 * cc + 0.125 * cp1_,
        0.625 * cc + 0.375 * cp1_,
    ], axis=-1).astype(dt)                           # (th, wt, 4C2)
    c2 = v2.shape[-1]
    return up2.reshape(th, 4 * wt, c2)


def _kernel(x0_ref, p1_ref, p2_ref, w1a_ref, w1b_ref, w1c_ref, b1_ref,
            *rest, th: int, wt: int, ni: int, nj: int, total: int,
            ns: int = 1, x0f4: bool = False, predot: bool = False):
    rest = list(rest)
    # x0f4: x0 arrives f4-packed (block (1, th, wt, 4C0)) and w1a_ref is
    # the phase-EVEN masked stack [[W],[0]]; w1ao_ref the ODD [[0],[W]]
    w1ao_ref = rest.pop(0) if x0f4 else None
    if len(rest) == 5:
        w2t_ref, out_ref, s1, s2, sems = rest
    else:
        out_ref, s1, s2, sems = rest
        w2t_ref = None

    # cross-program double-buffered halo DMA: program p starts p+1's
    # copies before waiting on its own (scratch + semaphores persist
    # across TPU grid steps).  Host-materialized windows were measured at
    # ~14 ms/step of pure HBM overhead; plain per-program DMA waits cost
    # ~14 ms of serialized stalls.
    p = (pl.program_id(0) * ni + pl.program_id(1)) * nj + pl.program_id(2)

    def dmas(slot, q):
        bi = q // (ni * nj)
        r = q % (ni * nj)
        ti = r // nj
        tj = r % nj
        return (
            pltpu.make_async_copy(
                p1_ref.at[bi, pl.ds(ti * (th // 2), th // 2 + 2),
                          pl.ds(tj * wt, wt + 16)],
                s1.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(
                p2_ref.at[bi, pl.ds(ti * (th // 4), th // 4 + 2),
                          pl.ds(tj * wt, wt + 16)],
                s2.at[slot], sems.at[1, slot]),
        )

    @pl.when(p == 0)
    def _():
        for c in dmas(0, p):
            c.start()

    @pl.when(p + 1 < total)
    def _():
        for c in dmas((p + 1) % 2, p + 1):
            c.start()

    dn = (((2,), (0,)), ((), ()))
    cp1, cp2 = dmas(p % 2, p)
    cp1.wait()
    dt = out_ref.dtype
    # ---- x2 upsample of p1 (f2-packed: lanes = [phase0 C1 | phase1 C1]).
    # +-1 cell shifts inside use POSITIVE pltpu.roll (a -1 shift is +(S-1)
    # with no wrap into the used window), so every slice starts at the
    # 8-aligned center and all concat operands share offset-0 layouts —
    # Mosaic rejects concats of mixed-offset operands, and sublane slices
    # at start 7/9 would carry offsets 7/1.
    up1 = _ups2x_block(s1[p % 2].astype(jnp.float32), th, wt, dt)

    cp2.wait()
    # ---- x4 upsample of p2 (unpacked: sublane = source column).
    # predot: bilinear upsampling commutes with the per-channel 1x1 head
    # map, so the fat 256-lane part dots FIRST at 1/16 of the rows and
    # only the n2-wide result expands (ns forced to 1 by the impl).
    v2 = s2[p % 2]
    if not predot:
        up2 = _ups4x_block(v2.astype(jnp.float32), th, wt, dt)

    # N-split loop (ns>1 only with the taps matmul): halving the hidden-N
    # per pass halves the f32 accumulator footprint, buying larger tiles.
    # Weight refs carry a leading (ns,) dim.
    if x0f4:
        xq = x0_ref[0]                               # (th, wt, 4C0) f4
        half = xq.shape[-1] // 2
        x_lo, x_hi = xq[:, :, :half], xq[:, :, half:]
    else:
        x0 = x0_ref[0]                               # (th, 4wt, C0)
    yt = None
    for s_i in range(ns):
        if x0f4:
            # FOUR-DOT INTERLEAVE (probed Mosaic-legal + exact on TPU,
            # _probe_x0unpack.py FOURDOT_F4): lane-slice the two 128-lane
            # halves (pixels 4i,4i+1 | 4i+2,4i+3), dot each against the
            # phase-masked stacks, lane-concat per cell, unpack-reshape to
            # per-pixel rows.  The zero rows make this bit-identical to
            # dot(unpacked_x0, w1a); padded-FLOP cost is unchanged (the
            # K=64 dot already padded to 128 lanes on the MXU).
            hs = [jax.lax.dot_general(part, wref[s_i], dn,
                                      preferred_element_type=jnp.float32)
                  for part in (x_lo, x_hi)
                  for wref in (w1a_ref, w1ao_ref)]
            both = jnp.concatenate(hs, axis=-1)      # (th, wt, 4n)
            acc = jnp.reshape(both, (th, 4 * wt, both.shape[-1] // 4))
        else:
            acc = jax.lax.dot_general(x0, w1a_ref[s_i], dn,
                                      preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(up1, w1b_ref[s_i], dn,
                                        preferred_element_type=jnp.float32)
        if predot:
            z2 = jax.lax.dot_general(v2, w1c_ref[s_i], dn,
                                     preferred_element_type=jnp.float32)
            acc = acc + _ups4x_block(z2, th, wt, jnp.float32)
        else:
            acc = acc + jax.lax.dot_general(
                up2, w1c_ref[s_i], dn, preferred_element_type=jnp.float32)
        h = acc + b1_ref[s_i]
        h = jnp.where(h >= 0, h, 0.2 * h)
        if w2t_ref is None:
            out_ref[0] = h.astype(dt)
            return
        # in-kernel taps-in-N matmul for both heads' 3x3s: writing the
        # 9*(Cr+Cs)-lane tap tensor instead of the 2C-lane hidden state
        # cuts the kernel's HBM output 4.3x (h never leaves VMEM); the
        # 9-way shifted add runs in XLA downstream
        # (ops/tapped_conv.taps_shifted_add)
        y = jax.lax.dot_general(h.astype(dt), w2t_ref[s_i], dn,
                                preferred_element_type=jnp.float32)
        yt = y if yt is None else yt + y
    out_ref[0] = yt.astype(dt)


def _ups_head_ref(p0, p1, p2, w1, b1):
    """XLA reference: upsample-concat + 1x1 + lrelu (the unfused math)."""
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )
    size = p0.shape[1:3]
    cat = jnp.concatenate([
        p0,
        interpolate_bilinear(p1, size=size, align_corners=False),
        interpolate_bilinear(p2, size=size, align_corners=False),
    ], axis=-1)
    h = jnp.einsum("bhwc,cn->bhwn", cat, w1.astype(cat.dtype),
                   preferred_element_type=cat.dtype) + b1.astype(cat.dtype)
    return jnp.where(h >= 0, h, 0.2 * h)


def _pallas_impl(p0, p1, p2, w1, b1, w2t=None, interpret=False,
                 x0_f4=False):
    import os

    if x0_f4:
        # p0 is f4-packed (B, H, W/4, 4*C0) — the BIT-IDENTICAL row-major
        # view of the stage-3 fuse0 kernel's own output block form
        # (ops/pallas_fuse0._impl writes f4 grid blocks), so reading it
        # here costs ZERO relayout copies: the 64-lane NHWC BlockSpec's
        # (8,128)-retile paid a measured 3.1 ms at 8x512x1024 bf16
        # (copy.361, docs/ROOFLINE_r3.md).
        b, h, w4_, c04 = p0.shape
        w, c0 = 4 * w4_, c04 // 4
    else:
        b, h, w, c0 = p0.shape
    c1, c2 = p1.shape[-1], p2.shape[-1]
    th, wt, ns = TH, WT, 1
    # 3-part predot REFUTED on the chip (35.65 vs 36.35 fps at the
    # flagship bench — the tuned x0f4/ns=2 form already wins there);
    # kept opt-in for A/B
    predot = os.environ.get("DVIE_UPSHEAD_PREDOT", "0") == "1"
    tile_env = os.environ.get("DVIE_UPSHEAD_TILE")
    if tile_env:
        t_th, t_wt, t_ns = (int(v) for v in tile_env.split(","))
        # t_th must be a positive multiple of 4: tile row ti maps to p2 rows
        # via ti*(th//4), so th<4 (th//4==0) would silently pin every halo
        # DMA to row 0 and corrupt all tiles past the first grid row
        if (t_th >= 4 and t_th % 4 == 0
                and h % t_th == 0 and (w // 4) % t_wt == 0
                and (t_ns == 1 or (w2t is not None
                                   and w1.shape[1] % t_ns == 0))):
            th, wt, ns = t_th, t_wt, t_ns
    if predot:
        ns = 1   # full-128-lane expansion of the pre-dotted z2
    w4 = w // 4
    while w4 % wt:
        wt //= 2
    assert h % th == 0 and w % 8 == 0 and wt >= 8, (h, w)

    dt = p0.dtype
    ni, nj = h // th, w4 // wt
    # pack p1 to f2 AFTER logical edge-padding (cell -1 phase 1 must clamp
    # to logical column 0, not column 1)
    p1p = jnp.pad(p1, ((0, 0), (1, 1), (16, 16), (0, 0)), mode="edge")
    p1p = p1p.reshape(b, h // 2 + 2, w4 + 16, 2 * c1)
    p2p = jnp.pad(p2, ((0, 0), (1, 1), (8, 8), (0, 0)), mode="edge")

    w1 = w1.astype(dt)
    n1 = w1.shape[1]
    n2 = n1 // ns

    def _nsplit(a):  # (rows, n1) -> (ns, rows, n2)
        return jnp.stack([a[:, k * n2:(k + 1) * n2] for k in range(ns)])

    w1a = _nsplit(w1[:c0])
    w1b = _nsplit(w1[c0:c0 + c1])
    w1c = _nsplit(w1[c0 + c1:])
    b1s = jnp.stack([b1[k * n2:(k + 1) * n2] for k in range(ns)]
                    ).astype(jnp.float32)
    n = n2 if w2t is None else w2t.shape[1]

    kern = functools.partial(_kernel, th=th, wt=wt, ni=ni, nj=nj,
                             total=b * ni * nj, ns=ns, x0f4=x0_f4,
                             predot=predot)
    if x0_f4:
        x0_spec = pl.BlockSpec((1, th, wt, 4 * c0),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM)
        zeros = jnp.zeros_like(w1a)
        w1a_e = jnp.concatenate([w1a, zeros], axis=1)   # (ns, 2c0, n2)
        w1a_o = jnp.concatenate([zeros, w1a], axis=1)
    else:
        x0_spec = pl.BlockSpec((1, th, 4 * wt, c0),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        x0_spec,
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [p0, p1p, p2p, w1a_e if x0_f4 else w1a, w1b, w1c, b1s]
    if x0_f4:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w1a_o)
    if w2t is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        w2ts = jnp.stack([w2t[k * n2:(k + 1) * n2] for k in range(ns)])
        args.append(w2ts.astype(dt))
    kwargs = {}
    if not interpret:
        # the Mosaic default scoped-VMEM budget is 16 MB — far below the
        # 128 MB physical VMEM — and it, not hardware, rejected every
        # larger-than-default tile in the r3 sweep (th=16 needs 19.55M:
        # "Scoped allocation ... exceeded scoped vmem limit by 3.55M")
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(b, ni, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, 4 * wt, n), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 2, wt + 16, 2 * c1), dt),
            pltpu.VMEM((2, th // 4 + 2, wt + 16, c2), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        **kwargs,
    )(*args)
    return out


@jax.custom_vjp
def ups_head_1x1(p0, p1, p2, w1, b1):
    """lrelu(concat([p0, up2x(p1), up4x(p2)], -1) @ w1 + b1), fused.

    p0 (B,H,W,C0), p1 (B,H/2,W/2,C1), p2 (B,H/4,W/4,C2); w1
    (C0+C1+C2, N); b1 (N,).  N packs all heads' 1x1s column-wise.
    """
    return _pallas_impl(p0, p1, p2, w1, b1)


def _fwd(p0, p1, p2, w1, b1):
    return ups_head_1x1(p0, p1, p2, w1, b1), (p0, p1, p2, w1, b1)


def _bwd(res, g):
    _, vjp = jax.vjp(_ups_head_ref, *res)
    return vjp(g)


ups_head_1x1.defvjp(_fwd, _bwd)


def _ups_head_taps_ref(p0, p1, p2, w1, b1, w2t):
    h = _ups_head_ref(p0, p1, p2, w1, b1)
    return jnp.einsum("bhwc,cn->bhwn", h, w2t.astype(h.dtype),
                      preferred_element_type=h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ups_head_taps(p0, p1, p2, w1, b1, w2t, explicit_bwd=True):
    """Fused upsample-concat + dual 1x1 + lrelu + taps-in-N matmul.

    Same as :func:`ups_head_1x1` followed by ``h @ w2t`` (both heads' 3x3
    head convs in taps-in-N form, ops/tapped_conv.build_dual_tap_kernel),
    but the 2C-lane hidden state never leaves VMEM — only the
    (B, H, W, 9*(Cr+Cs)) tap tensor is written (4.3x less output HBM at
    the HRNet head shape).  Finish with taps_shifted_add + bias.

    ``explicit_bwd`` (static) selects the hand-scheduled backward (see
    :func:`_explicit_taps_bwd`); pass False to force the
    jax.vjp-of-reference backward — the VAE coarse under ``--remat``
    needs it (the explicit path's h-recompute raises the full-res GAN
    recipe's compiler peak 15.624 -> 15.776 GiB, over the 15.75 budget,
    while the plain-HRNet remat recipe DROPS 15.742 -> 13.94 with the
    explicit one; measured r4, docs/TRAINBENCH_r4.md).
    """
    return _pallas_impl(p0, p1, p2, w1, b1, w2t=w2t)


def _fwd_taps(p0, p1, p2, w1, b1, w2t, explicit_bwd):
    return (ups_head_taps(p0, p1, p2, w1, b1, w2t, explicit_bwd),
            (p0, p1, p2, w1, b1, w2t))


def _explicit_taps_bwd(p0, p1, p2, w1, b1, w2t, g):
    """Hand-scheduled backward for the taps head (r4 train-MFU lever).

    The autodiff backward (``jax.vjp`` of ``_ups_head_taps_ref``)
    re-materializes the 896-ch hidden for BOTH einsum vjps and regroups
    the cotangent into a 5-D per-tap tensor — together ~9 GB / 13 ms of
    the 128x128 bs32 train step (r4 train trace, docs/TRAINBENCH_r4.md).
    This version hand-schedules the same math:

    - ``h`` is recomputed ONCE with the fused Pallas forward
      (:func:`ups_head_1x1`), so the upsample-concat never makes an HBM
      round trip on its own;
    - the lrelu mask comes from ``sign(h)`` (lrelu preserves sign), so
      the pre-activation is never stored;
    - both weight grads contract the cotangent in its native
      (B, H, W, N) form — no 5-D regrouping — with f32 accumulation
      (>= the autodiff path's bf16-output precision);
    - ``dp1``/``dp2`` ride the structured vjp of
      ``interpolate_bilinear`` on the already-split 128/256-ch slices.

    MEASURED (r4, real chip, 128x128 bs32 recipe): throughput-neutral —
    7.133 vs 7.130 steps/s (the saved materializations are repaid by the
    Pallas h-recompute write); kept DEFAULT ON for the accuracy win:
    every gradient lands 4-50x closer to the f32-oracle than the
    autodiff-bf16 path (dx0 3.7e-2 -> 2.7e-3, dw1 8.5e-3 -> 6.1e-4,
    dw2t 3.2e-3 -> 5.7e-5 max-rel).  DVIE_HEAD_EXPL_BWD=0 restores the
    autodiff composition.
    """
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )

    c0, c1, c2 = p0.shape[-1], p1.shape[-1], p2.shape[-1]
    size = p0.shape[1:3]
    h = ups_head_1x1(p0, p1, p2, w1, b1)            # fused recompute
    dw2t = jnp.einsum("bhwc,bhwn->cn", h, g,
                      preferred_element_type=jnp.float32)
    dh = jnp.einsum("bhwn,cn->bhwc", g, w2t.astype(g.dtype),
                    preferred_element_type=g.dtype)
    dpre = jnp.where(h >= 0, dh, jnp.asarray(0.2, dh.dtype) * dh)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=(0, 1, 2))
    up1, up1_vjp = jax.vjp(
        lambda x: interpolate_bilinear(x, size=size, align_corners=False), p1)
    up2, up2_vjp = jax.vjp(
        lambda x: interpolate_bilinear(x, size=size, align_corners=False), p2)
    # dw1 row-blocks per pyramid part: no (B,H,W,448) concat materializes
    dw1 = jnp.concatenate([
        jnp.einsum("bhwc,bhwn->cn", part, dpre,
                   preferred_element_type=jnp.float32)
        for part in (p0, up1, up2)], axis=0)
    dcat = jnp.einsum("bhwn,cn->bhwc", dpre, w1.astype(dpre.dtype),
                      preferred_element_type=dpre.dtype)
    dp0 = dcat[..., :c0].astype(p0.dtype)
    (dp1,) = up1_vjp(dcat[..., c0:c0 + c1])
    (dp2,) = up2_vjp(dcat[..., c0 + c1:])
    return (dp0, dp1.astype(p1.dtype), dp2.astype(p2.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2t.astype(w2t.dtype))


def _use_explicit_bwd() -> bool:
    import os
    return os.environ.get("DVIE_HEAD_EXPL_BWD", "1") != "0"


def _bwd_taps(explicit_bwd, res, g):
    if explicit_bwd and _use_explicit_bwd():
        return _explicit_taps_bwd(*res, g)
    _, vjp = jax.vjp(_ups_head_taps_ref, *res)
    return vjp(g)


ups_head_taps.defvjp(_fwd_taps, _bwd_taps)


def fits(p0, p1, p2) -> bool:
    """Shape gate for the fused path (see _pallas_impl asserts)."""
    b, h, w, c0 = p0.shape
    return (h % TH == 0 and w % 32 == 0 and w >= 32
            and p1.shape[1:3] == (h // 2, w // 2)
            and p2.shape[1:3] == (h // 4, w // 4)
            and p1.shape[-1] % 128 == 0 and p2.shape[-1] % 128 == 0
            and (h // 4) >= 2)


# ---------------------------------------------------------------------------
# f4-x0 variant: x0 consumed as the f4-packed (B, H, W/4, 4*C0) row-major
# view — BIT-IDENTICAL to the stage-3 fuse0 kernel's own output block
# form (ops/pallas_fuse0._impl writes f4 grid blocks and only VIEWS the
# result as NHWC), killing the producer->kernel retile copy (copy.361,
# 3.1 ms at 8x512x1024 bf16; the consumer-side re-view cancels the
# producer's host reshape).  Per-pixel rows are recovered in-VMEM by the
# FOUR-DOT INTERLEAVE lowering probed exact on TPU (_probe_x0unpack.py):
# lane-slice the 128-lane halves, dot each against [[W],[0]] / [[0],[W]],
# lane-concat, unpack-reshape — same padded FLOPs as the padded K=64 dot
# it replaces.
# ---------------------------------------------------------------------------


def _unpack_x0f4(x0f4):
    """(B, H, W/4, 4C0) f4 -> (B, H, W, C0) NHWC (free row-major view;
    used by the vjp reference and the fits-miss fallback)."""
    b, h, w4, c04 = x0f4.shape
    return x0f4.reshape(b, h, 4 * w4, c04 // 4)


def _ups_head_taps_x0f4_ref(x0f4, p1, p2, w1, b1, w2t):
    return _ups_head_taps_ref(_unpack_x0f4(x0f4), p1, p2, w1, b1, w2t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def ups_head_taps_x0f4(x0f4, p1, p2, w1, b1, w2t, explicit_bwd=True):
    """``ups_head_taps`` with x0 in the f4-packed form (see above);
    ``explicit_bwd`` as in :func:`ups_head_taps`."""
    return _pallas_impl(x0f4, p1, p2, w1, b1, w2t=w2t, x0_f4=True)


def _fwd_taps_x0f4(x0f4, p1, p2, w1, b1, w2t, explicit_bwd):
    return (ups_head_taps_x0f4(x0f4, p1, p2, w1, b1, w2t, explicit_bwd),
            (x0f4, p1, p2, w1, b1, w2t))


def _bwd_taps_x0f4(explicit_bwd, res, g):
    if explicit_bwd and _use_explicit_bwd():
        x0f4, p1, p2, w1, b1, w2t = res
        b, hh, w4, c04 = x0f4.shape
        dp0, dp1, dp2, dw1, db1, dw2t = _explicit_taps_bwd(
            _unpack_x0f4(x0f4), p1, p2, w1, b1, w2t, g)
        return (dp0.reshape(b, hh, w4, c04), dp1, dp2, dw1, db1, dw2t)
    _, vjp = jax.vjp(_ups_head_taps_x0f4_ref, *res)
    return vjp(g)


ups_head_taps_x0f4.defvjp(_fwd_taps_x0f4, _bwd_taps_x0f4)


def fits_x0f4(x0f4, p1, p2, n1: int) -> bool:
    """Shape gate for the f4-x0 path: the probed lowerings additionally
    need 4*C0 == 256 exactly (two 128-lane phase pairs per f4 cell) and
    the hidden width a 128 multiple (the unpack-reshape target)."""
    b, h, w4, c04 = x0f4.shape
    w = 4 * w4
    return (c04 == 256 and n1 % 128 == 0
            and h % TH == 0 and w % 32 == 0 and w >= 32
            and p1.shape[1:3] == (h // 2, w // 2)
            and p2.shape[1:3] == (h // 4, w // 4)
            and p1.shape[-1] % 128 == 0 and p2.shape[-1] % 128 == 0
            and (h // 4) >= 2)


# ---------------------------------------------------------------------------
# Folded-taps variant: the 9-way shifted add + bias runs IN-KERNEL, so the
# (B, H, W, 9*co) tap tensor never touches HBM (at the bench head shape
# that round trip is ~1.73 GB/step plus a measured 5.9 ms retile copy for
# the (16, 128) 5-D view taps_shifted_add needs).  Shape changes vs
# ups_head_taps:
#
# - full-width tiles (nj = 1): the +-1-pixel kx taps then never cross a W
#   tile boundary (handled by in-tile rolls with wrap masking), so p0
#   needs no W halo — it keeps its plain pipelined BlockSpec.
# - the +-1-row ky taps cross ROW tiles.  Instead of recompute, the grid
#   runs (b, ni + 1) with a one-tile finalize DELAY: program i computes
#   yt for tile i into a rotating VMEM slot, then finalizes OUTPUT tile
#   i-1 from [carry row | slot i-1 | first row of slot i]; a 1-row carry
#   buffer holds tile i-2's last row.  Slots/carry persist across the
#   sequential TPU grid (the cross-program-scratch pattern of
#   ops/pallas_chain._block_kernel_dma).  Zero recompute, zero extra
#   reads; program i's out block maps to row-tile max(i-1, 0) (the i=0
#   garbage block is revisited and overwritten by i=1 before copy-back).
# - tap-block extraction inside the finalize uses LANE ROLLS by co*t on
#   the (th, W, 9*co) accumulator plus one final [..., :co] store slice
#   (sub-128 lane ops — legality probed on TPU by _probe_laneroll.py:
#   f32 rolls compile+run correctly at every probed shape/shift, the
#   identical bf16 rolls hit a Mosaic compile bug, HTTP 500).  The r2
#   TPU A/B measured the f32 fold at 32.93 fps vs 35.67 base — LOSES
#   badly; stays opt-in via DVIE_UPSHEAD_FOLD=1 (docs/ABLOG_r2.md).
#
# Differentiable via custom_vjp against the XLA reference (shifted add
# f32-accumulated, matching the kernel's arithmetic).
# ---------------------------------------------------------------------------


def _shift_px(a, s):
    """result[:, x] = a[:, x+s] with zero edges (s in {-1, 0, +1}); dim 1
    is the pixel dim.  Positive rolls + wrap masking (sublane slices at
    offset 1 carry layouts Mosaic cannot concat; see pallas_head notes)."""
    if s == 0:
        return a
    S = a.shape[1]
    r = pltpu.roll(a, (-s) % S, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
    edge = S - 1 if s == 1 else 0
    return jnp.where(col == edge, 0.0, r)


def _kernel_fold(x0_ref, p1_ref, p2_ref, w1a_ref, w1b_ref, w1c_ref, b1_ref,
                 w2t_ref, b2_ref, out_ref, s1, s2, ytb, carry, sems, *,
                 th, wt, ni, ns, co):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    i_eff = jnp.minimum(i, ni - 1)

    cp1 = pltpu.make_async_copy(
        p1_ref.at[bi, pl.ds(i_eff * (th // 2), th // 2 + 2)],
        s1, sems.at[0])
    cp2 = pltpu.make_async_copy(
        p2_ref.at[bi, pl.ds(i_eff * (th // 4), th // 4 + 2)],
        s2, sems.at[1])

    @pl.when(i < ni)
    def _compute():
        cp1.start()
        cp2.start()
        dn = (((2,), (0,)), ((), ()))
        cp1.wait()
        v1 = s1[...].astype(jnp.float32)             # (th/2+2, wt+16, 2C1)
        rows = []
        for r in range(th):
            a = r // 2 + 1
            if r % 2 == 0:
                rows.append(0.25 * v1[a - 1] + 0.75 * v1[a])
            else:
                rows.append(0.75 * v1[a] + 0.25 * v1[a + 1])
        u1 = jnp.stack(rows)
        c1 = u1.shape[-1] // 2
        ph0, ph1 = u1[:, :, :c1], u1[:, :, c1:]
        s_cells = u1.shape[1]
        cm1_p1 = pltpu.roll(ph1, 1, axis=1)[:, 8:8 + wt]
        c_p0 = ph0[:, 8:8 + wt]
        c_p1 = ph1[:, 8:8 + wt]
        cp1_p0 = pltpu.roll(ph0, s_cells - 1, axis=1)[:, 8:8 + wt]
        dt = out_ref.dtype
        up1 = jnp.concatenate([
            0.25 * cm1_p1 + 0.75 * c_p0,
            0.75 * c_p0 + 0.25 * c_p1,
            0.25 * c_p0 + 0.75 * c_p1,
            0.75 * c_p1 + 0.25 * cp1_p0,
        ], axis=-1).astype(dt)
        up1 = up1.reshape(th, 4 * wt, c1)

        cp2.wait()
        v2 = s2[...].astype(jnp.float32)             # (th/4+2, wt+16, C2)
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
        u2 = jnp.stack(rows)
        cm1 = pltpu.roll(u2, 1, axis=1)[:, 8:8 + wt]
        cc = u2[:, 8:8 + wt]
        cp1_ = pltpu.roll(u2, u2.shape[1] - 1, axis=1)[:, 8:8 + wt]
        up2 = jnp.concatenate([
            0.375 * cm1 + 0.625 * cc,
            0.125 * cm1 + 0.875 * cc,
            0.875 * cc + 0.125 * cp1_,
            0.625 * cc + 0.375 * cp1_,
        ], axis=-1).astype(dt)
        c2 = v2.shape[-1]
        up2 = up2.reshape(th, 4 * wt, c2)

        x0 = x0_ref[0]                               # (th, 4wt, C0)
        yt = None
        for s_i in range(ns):
            acc = jax.lax.dot_general(x0, w1a_ref[s_i], dn,
                                      preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                up1, w1b_ref[s_i], dn, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                up2, w1c_ref[s_i], dn, preferred_element_type=jnp.float32)
            h = acc + b1_ref[s_i]
            h = jnp.where(h >= 0, h, 0.2 * h)
            y = jax.lax.dot_general(h.astype(dt), w2t_ref[s_i], dn,
                                    preferred_element_type=jnp.float32)
            yt = y if yt is None else yt + y
        ytb[i % 2] = yt.astype(ytb.dtype)

    @pl.when(i == ni)
    def _():
        ytb[i % 2] = jnp.zeros_like(ytb[i % 2])

    @pl.when(i >= 1)
    def _finalize():
        t_lanes = ytb.shape[-1]
        ytp = ytb[(i - 1) % 2].astype(jnp.float32)   # tile i-1
        top = jnp.where(i == 1, 0.0, carry[...].astype(jnp.float32))
        first_cur = ytb[i % 2][0:1].astype(jnp.float32)
        ytw = jnp.concatenate([top, ytp, first_cur], axis=0)
        acc = None
        for ky in range(3):
            rows = ytw[ky:ky + th]
            for kx in range(3):
                t = ky * 3 + kx
                sh = _shift_px(rows, kx - 1)
                if t:
                    sh = pltpu.roll(sh, (t_lanes - co * t) % t_lanes,
                                    axis=2)
                acc = sh if acc is None else acc + sh
        out = acc[..., :co] + b2_ref[...].astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)
        carry[...] = ytb[(i - 1) % 2][th - 1:th]


def _fold_impl(p0, p1, p2, w1, b1, w2t, b2, interpret=False):
    import os

    b, h, w, c0 = p0.shape
    c1, c2 = p1.shape[-1], p2.shape[-1]
    co = b2.shape[0]
    th, ns = 8, 2
    env = os.environ.get("DVIE_FOLD_TILE")
    if env:
        t_th, t_ns = (int(v) for v in env.split(","))
        if (t_th >= 4 and t_th % 4 == 0 and h % t_th == 0
                and w1.shape[1] % t_ns == 0):
            th, ns = t_th, t_ns
    wt = w // 4
    assert h % th == 0 and w % 8 == 0
    dt = p0.dtype
    ni = h // th
    n_taps = w2t.shape[1]
    assert n_taps == 9 * co, (n_taps, co)

    p1p = jnp.pad(p1, ((0, 0), (1, 1), (16, 16), (0, 0)), mode="edge")
    p1p = p1p.reshape(b, h // 2 + 2, w // 4 + 16, 2 * c1)
    p2p = jnp.pad(p2, ((0, 0), (1, 1), (8, 8), (0, 0)), mode="edge")

    w1 = w1.astype(dt)
    n1 = w1.shape[1]
    n2 = n1 // ns

    def _nsplit(a):
        return jnp.stack([a[:, k * n2:(k + 1) * n2] for k in range(ns)])

    w1a = _nsplit(w1[:c0])
    w1b = _nsplit(w1[c0:c0 + c1])
    w1c = _nsplit(w1[c0 + c1:])
    b1s = jnp.stack([b1[k * n2:(k + 1) * n2] for k in range(ns)]
                    ).astype(jnp.float32)
    w2ts = jnp.stack([w2t[k * n2:(k + 1) * n2] for k in range(ns)]
                     ).astype(dt)

    kern = functools.partial(_kernel_fold, th=th, wt=wt, ni=ni, ns=ns,
                             co=co)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(b, ni + 1),
        in_specs=[
            pl.BlockSpec((1, th, 4 * wt, c0),
                         lambda bi, i: (bi, jnp.minimum(i, ni - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            w_spec, w_spec, w_spec, w_spec, w_spec, w_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, th, 4 * wt, co),
            lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), dt),
        scratch_shapes=[
            pltpu.VMEM((th // 2 + 2, wt + 16, 2 * c1), dt),
            pltpu.VMEM((th // 4 + 2, wt + 16, c2), dt),
            pltpu.VMEM((2, th, 4 * wt, n_taps), dt),
            pltpu.VMEM((1, 4 * wt, n_taps), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        **kwargs,
    )(p0, p1p, p2p, w1a, w1b, w1c, b1s, w2ts,
      b2.reshape(1, -1).astype(jnp.float32))


def _ups_head_taps_fold_ref(p0, p1, p2, w1, b1, w2t, b2):
    """XLA reference: taps + f32-accumulated 9-way shifted add + bias
    (matches the kernel's arithmetic: yt cast to p0.dtype, adds in f32)."""
    yt = _ups_head_taps_ref(p0, p1, p2, w1, b1, w2t)
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
    return (out + b2.astype(jnp.float32)).astype(p0.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ups_head_taps_fold(p0, p1, p2, w1, b1, w2t, b2, interpret=False):
    """ups_head_taps with the 9-way shifted add + bias folded in-kernel;
    returns the finished (B, H, W, co) head output.  Opt-in
    (DVIE_UPSHEAD_FOLD=1) pending the TPU lane-roll probe + A/B."""
    return _fold_impl(p0, p1, p2, w1, b1, w2t, b2, interpret)


def _fwd_fold(p0, p1, p2, w1, b1, w2t, b2, interpret):
    return (ups_head_taps_fold(p0, p1, p2, w1, b1, w2t, b2, interpret),
            (p0, p1, p2, w1, b1, w2t, b2))


def _bwd_fold(interpret, res, g):
    _, vjp = jax.vjp(_ups_head_taps_fold_ref, *res)
    return vjp(g)


ups_head_taps_fold.defvjp(_fwd_fold, _bwd_fold)


def fits_fold(p0, p1, p2) -> bool:
    """Shape gate for the folded-taps path (full-width tiles)."""
    b, h, w, c0 = p0.shape
    return (fits(p0, p1, p2) and h % 8 == 0
            and (w // 4) >= 16)


# ---------------------------------------------------------------------------
# 4-part variant (--highres_large): the stage-4 pyramid adds a 1/8-res
# 512-ch part (models/hrnet.STAGE4_CFG; reference nets/HRNet.py HIGH4 cfg),
# making the heads region the dominant cost of that config (cin = 960,
# the concat alone is 8.1 GB at 8x512x1024 bf16).  Same design as
# _kernel with a third DMA'd slab and x8 upsampling: rows blend with
# per-phase weights d = (p - 3.5)/8 (the half-pixel generalization of
# the x2/x4 tables), columns emit f8-packed cells (one source column
# feeds TWO output cells) unpacked by a lane-block reshape (target lane
# 512, the Mosaic-supported (a, b, f*C) -> (a, f*b, C) form).
# DEFAULT ON (DVIE_FUSED_HEAD4=0 disables) since the r2/r3 TPU runs: a
# CORRECTNESS gate for --highres_large, where the unfused 960-ch tail
# OOMs the 16 GB HBM at 8x512x1024 bf16 (23.63G: concat + h1 + remat
# copy, ~8 GB each) while this kernel runs 19.21 fps (docs/ABLOG_r2.md).
# ---------------------------------------------------------------------------


def _kernel4(x0_ref, p1_ref, p2_ref, p3_ref, w1a_ref, w1b_ref, w1c_ref,
             w1d_ref, b1_ref, *rest, th: int, wt: int, ni: int, nj: int,
             total: int, ns: int = 1, predot: bool = False):
    # rest = [w2t_ref?] + [out_ref, s1, s2, s3, sems]
    if len(rest) == 6:
        w2t_ref, out_ref, s1, s2, s3, sems = rest
    else:
        out_ref, s1, s2, s3, sems = rest
        w2t_ref = None

    p = (pl.program_id(0) * ni + pl.program_id(1)) * nj + pl.program_id(2)

    def dmas(slot, q):
        bi = q // (ni * nj)
        r = q % (ni * nj)
        ti = r // nj
        tj = r % nj
        return (
            pltpu.make_async_copy(
                p1_ref.at[bi, pl.ds(ti * (th // 2), th // 2 + 2),
                          pl.ds(tj * wt, wt + 16)],
                s1.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(
                p2_ref.at[bi, pl.ds(ti * (th // 4), th // 4 + 2),
                          pl.ds(tj * wt, wt + 16)],
                s2.at[slot], sems.at[1, slot]),
            pltpu.make_async_copy(
                p3_ref.at[bi, pl.ds(ti * (th // 8), th // 8 + 2),
                          pl.ds(tj * (wt // 2), wt // 2 + 16)],
                s3.at[slot], sems.at[2, slot]),
        )

    @pl.when(p == 0)
    def _():
        for c in dmas(0, p):
            c.start()

    @pl.when(p + 1 < total)
    def _():
        for c in dmas((p + 1) % 2, p + 1):
            c.start()

    dn = (((2,), (0,)), ((), ()))
    cp1, cp2, cp3 = dmas(p % 2, p)
    dt = out_ref.dtype

    cp1.wait()
    v1 = s1[p % 2].astype(jnp.float32)
    rows = []
    for r in range(th):
        a = r // 2 + 1
        if r % 2 == 0:
            rows.append(0.25 * v1[a - 1] + 0.75 * v1[a])
        else:
            rows.append(0.75 * v1[a] + 0.25 * v1[a + 1])
    u1 = jnp.stack(rows)
    c1 = u1.shape[-1] // 2
    ph0, ph1 = u1[:, :, :c1], u1[:, :, c1:]
    s_cells = u1.shape[1]
    cm1_p1 = pltpu.roll(ph1, 1, axis=1)[:, 8:8 + wt]
    c_p0 = ph0[:, 8:8 + wt]
    c_p1 = ph1[:, 8:8 + wt]
    cp1_p0 = pltpu.roll(ph0, s_cells - 1, axis=1)[:, 8:8 + wt]
    up1 = jnp.concatenate([
        0.25 * cm1_p1 + 0.75 * c_p0,
        0.75 * c_p0 + 0.25 * c_p1,
        0.25 * c_p0 + 0.75 * c_p1,
        0.75 * c_p1 + 0.25 * cp1_p0,
    ], axis=-1).astype(dt)
    up1 = up1.reshape(th, 4 * wt, c1)

    def _expand2(u2, c_out):
        """4x W-phase expansion of a (th, wt+16, C) row-expanded tile."""
        cm1 = pltpu.roll(u2, 1, axis=1)[:, 8:8 + wt]
        cc = u2[:, 8:8 + wt]
        cp1_ = pltpu.roll(u2, u2.shape[1] - 1, axis=1)[:, 8:8 + wt]
        out = jnp.concatenate([
            0.375 * cm1 + 0.625 * cc,
            0.125 * cm1 + 0.875 * cc,
            0.875 * cc + 0.125 * cp1_,
            0.625 * cc + 0.375 * cp1_,
        ], axis=-1)
        return out.reshape(th, 4 * wt, c_out)

    def _rows2(v2):
        rows = []
        wts4 = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125),
                (0.625, 0.375))
        for r in range(th):
            a = r // 4 + 1
            w_lo, w_hi = wts4[r % 4]
            if r % 4 < 2:
                rows.append(w_lo * v2[a - 1] + w_hi * v2[a])
            else:
                rows.append(w_lo * v2[a] + w_hi * v2[a + 1])
        return jnp.stack(rows)

    def _rows3(v3):
        rows = []
        for r in range(th):
            a = r // 8 + 1
            d = (r % 8 - 3.5) / 8.0
            if d < 0:
                rows.append((-d) * v3[a - 1] + (1.0 + d) * v3[a])
            else:
                rows.append((1.0 - d) * v3[a] + d * v3[a + 1])
        return jnp.stack(rows)                    # (th, wt/2+16, C)

    def _expand3(u3, c_out):
        """8x W-phase expansion of a (th, wt/2+16, C) row-expanded tile."""
        cm1_3 = pltpu.roll(u3, 1, axis=1)[:, 8:8 + wt // 2]
        cc_3 = u3[:, 8:8 + wt // 2]
        cp1_3 = pltpu.roll(u3, u3.shape[1] - 1, axis=1)[:, 8:8 + wt // 2]
        phases = []
        for q in range(8):
            d = (q - 3.5) / 8.0
            if d < 0:
                phases.append((-d) * cm1_3 + (1.0 + d) * cc_3)
            else:
                phases.append((1.0 - d) * cc_3 + d * cp1_3)
        return jnp.concatenate(phases, axis=-1).reshape(th, 4 * wt, c_out)

    cp2.wait()
    v2 = s2[p % 2].astype(jnp.float32)
    cp3.wait()
    v3 = s3[p % 2].astype(jnp.float32)            # (th/8+2, wt/2+16, C3)
    if not predot:
        up2 = _expand2(_rows2(v2), v2.shape[-1]).astype(dt)
        up3 = _expand3(_rows3(v3), v3.shape[-1]).astype(dt)

    x0 = x0_ref[0]
    yt = None
    for s_i in range(ns):
        acc = jax.lax.dot_general(x0, w1a_ref[s_i], dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(up1, w1b_ref[s_i], dn,
                                        preferred_element_type=jnp.float32)
        if predot:
            # bilinear upsampling commutes with the per-channel 1x1 head
            # map: dot the fat low-res parts FIRST (p2 at 1/16, p3 at
            # 1/64 of the rows), then expand the n2-wide results — 4.4x
            # fewer head MACs than upsample-then-dot at this geometry
            z2 = jax.lax.dot_general(
                v2.astype(dt), w1c_ref[s_i], dn,
                preferred_element_type=jnp.float32)
            acc = acc + _expand2(_rows2(z2), z2.shape[-1])
            z3 = jax.lax.dot_general(
                v3.astype(dt), w1d_ref[s_i], dn,
                preferred_element_type=jnp.float32)
            acc = acc + _expand3(_rows3(z3), z3.shape[-1])
        else:
            acc = acc + jax.lax.dot_general(
                up2, w1c_ref[s_i], dn, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                up3, w1d_ref[s_i], dn, preferred_element_type=jnp.float32)
        h = acc + b1_ref[s_i]
        h = jnp.where(h >= 0, h, 0.2 * h)
        if w2t_ref is None:
            out_ref[0] = h.astype(dt)
            return
        y = jax.lax.dot_general(h.astype(dt), w2t_ref[s_i], dn,
                                preferred_element_type=jnp.float32)
        yt = y if yt is None else yt + y
    out_ref[0] = yt.astype(dt)


def _pallas_impl4(p0, p1, p2, p3, w1, b1, w2t=None, interpret=False):
    import os

    b, h, w, c0 = p0.shape
    c1, c2, c3 = p1.shape[-1], p2.shape[-1], p3.shape[-1]
    th, wt, ns = 8, 32, 2
    # DEFAULT ON (r5 A/B at the HL bench: 20.18 vs 19.27 fps; the
    # losing tile retunes 19.04/18.65 and the flagship 3-part port
    # 35.65-vs-36.35 are the measured refutations that scope it to the
    # 4-part geometry, docs/ROOFLINE_r5.md)
    predot = os.environ.get("DVIE_UPSHEAD4_PREDOT", "1") == "1"
    env = os.environ.get("DVIE_UPSHEAD4_TILE")
    if env:
        t_th, t_wt, t_ns = (int(v) for v in env.split(","))
        if (t_th >= 8 and t_th % 8 == 0 and h % t_th == 0
                and (w // 4) % t_wt == 0 and t_wt % 2 == 0
                and w1.shape[1] % t_ns == 0):
            th, wt, ns = t_th, t_wt, t_ns
    if predot:
        # pre-dot mode (see _kernel4): single hidden split keeps the
        # expanded z tensors at full 128 lanes
        ns = 1
    w4 = w // 4
    while w4 % wt or wt % 2:
        wt //= 2
    assert h % th == 0 and th % 8 == 0 and wt >= 8, (h, w, th, wt)

    dt = p0.dtype
    ni, nj = h // th, w4 // wt
    p1p = jnp.pad(p1, ((0, 0), (1, 1), (16, 16), (0, 0)), mode="edge")
    p1p = p1p.reshape(b, h // 2 + 2, w4 + 16, 2 * c1)
    p2p = jnp.pad(p2, ((0, 0), (1, 1), (8, 8), (0, 0)), mode="edge")
    p3p = jnp.pad(p3, ((0, 0), (1, 1), (8, 8), (0, 0)), mode="edge")

    w1 = w1.astype(dt)
    n1 = w1.shape[1]
    n2 = n1 // ns

    def _nsplit(a):
        return jnp.stack([a[:, k * n2:(k + 1) * n2] for k in range(ns)])

    w1a = _nsplit(w1[:c0])
    w1b = _nsplit(w1[c0:c0 + c1])
    w1c = _nsplit(w1[c0 + c1:c0 + c1 + c2])
    w1d = _nsplit(w1[c0 + c1 + c2:])
    b1s = jnp.stack([b1[k * n2:(k + 1) * n2] for k in range(ns)]
                    ).astype(jnp.float32)
    n = n2 if w2t is None else w2t.shape[1]

    kern = functools.partial(_kernel4, th=th, wt=wt, ni=ni, nj=nj,
                             total=b * ni * nj, ns=ns, predot=predot)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, th, 4 * wt, c0), lambda bi, i, j: (bi, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        w_spec, w_spec, w_spec, w_spec, w_spec,
    ]
    args = [p0, p1p, p2p, p3p, w1a, w1b, w1c, w1d, b1s]
    if w2t is not None:
        in_specs.append(w_spec)
        w2ts = jnp.stack([w2t[k * n2:(k + 1) * n2] for k in range(ns)])
        args.append(w2ts.astype(dt))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(b, ni, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, 4 * wt, n), lambda bi, i, j: (bi, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 2, wt + 16, 2 * c1), dt),
            pltpu.VMEM((2, th // 4 + 2, wt + 16, c2), dt),
            pltpu.VMEM((2, th // 8 + 2, wt // 2 + 16, c3), dt),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        interpret=interpret,
        **kwargs,
    )(*args)


def _ups_head_ref4(p0, p1, p2, p3, w1, b1):
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )
    size = p0.shape[1:3]
    cat = jnp.concatenate([
        p0,
        interpolate_bilinear(p1, size=size, align_corners=False),
        interpolate_bilinear(p2, size=size, align_corners=False),
        interpolate_bilinear(p3, size=size, align_corners=False),
    ], axis=-1)
    h = jnp.einsum("bhwc,cn->bhwn", cat, w1.astype(cat.dtype),
                   preferred_element_type=cat.dtype) + b1.astype(cat.dtype)
    return jnp.where(h >= 0, h, 0.2 * h)


def _ups_head_taps_ref4(p0, p1, p2, p3, w1, b1, w2t):
    h = _ups_head_ref4(p0, p1, p2, p3, w1, b1)
    return jnp.einsum("bhwc,cn->bhwn", h, w2t.astype(h.dtype),
                      preferred_element_type=h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ups_head_taps4(p0, p1, p2, p3, w1, b1, w2t, interpret=False):
    """4-part (highres_large) fused upsample-concat + dual 1x1 + taps."""
    return _pallas_impl4(p0, p1, p2, p3, w1, b1, w2t, interpret)


def _fwd_taps4(p0, p1, p2, p3, w1, b1, w2t, interpret):
    return (ups_head_taps4(p0, p1, p2, p3, w1, b1, w2t, interpret),
            (p0, p1, p2, p3, w1, b1, w2t))


def _bwd_taps4(interpret, res, g):
    _, vjp = jax.vjp(_ups_head_taps_ref4, *res)
    return vjp(g)


ups_head_taps4.defvjp(_fwd_taps4, _bwd_taps4)


def fits4(p0, p1, p2, p3) -> bool:
    b, h, w, c0 = p0.shape
    return (h % 8 == 0 and w % 64 == 0 and w >= 64
            and p1.shape[1:3] == (h // 2, w // 2)
            and p2.shape[1:3] == (h // 4, w // 4)
            and p3.shape[1:3] == (h // 8, w // 8)
            and p1.shape[-1] % 128 == 0 and p2.shape[-1] % 128 == 0
            and p3.shape[-1] % 128 == 0 and (h // 8) >= 2)
