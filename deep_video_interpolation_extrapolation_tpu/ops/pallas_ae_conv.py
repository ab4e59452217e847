"""Single width-packed 3x3 conv via the A+E decomposition, in Pallas.

The standard packed 3x3 (ops/packed_conv.pack_kernel_3x3) executes a dense
(3, 3, fC, fO) kernel whose cross-phase blocks are ~half structured zeros:
at f=2 the MXU performs 2x the conv's nominal FLOPs — and the trace shows
XLA runs these convs at 97-100% of that padded wall, so the wall itself is
the only thing left to attack.  The A+E split lowers it to 1.33x nominal:

- A: the same-cell taps.  For f=2 every |dx|<=1 tap lands inside the cell,
  so A is a FULLY DENSE (3, 2C, 2O) per-ky matmul — zero waste.
- E: the two cross-cell taps (out phase 0 <- prev cell phase 1, out phase
  f-1 <- next cell phase 0), a (3, 2C, 2O) matrix with 2 nonzero C x O
  blocks, fed by the +-1-cell rolls of the input (VMEM-only here; the
  XLA-composed A+E split lost 45->69 ms materializing these shifts to HBM,
  ops/packed_conv.ae_kernels_3x3 notes).

Optional residual-add and leaky-ReLU fuse into the same pass (the
BasicBlock tail).  SAME zero padding comes from host-side zero pads —
exact for a linear conv.  Cross-program double-buffered halo DMA as in
ops/pallas_resblock.py.  Differentiable via custom_vjp against the XLA
packed reference.

MEASURED (v5e, full InterNet/HRNet bench @1024x512 bf16 bs8, round 2):
routed from the BasicBlock branch chains + Bottleneck conv2 + packed
transitions this kernel is a 29.57 -> 22.31 fps REGRESSION, despite the
1.33x-vs-2x FLOP win.  Same failure mode as ops/pallas_chain.py: each
insertion drops row-major {3,2,1,0} Pallas IO into the middle of a
{3,0,2,1} packed-conv chain, buying two full-size relayout copies per
call — and this route inserts ~20 of them.  Kept opt-in
(DVIE_AE_CONV=1); a win here requires whole-chain fusion so the layout
boundary is paid once per chain, not per conv.
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

_DN = (((2,), (0,)), ((), ()))


def _edge_kernel(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, fC, fO) E matrix for the in-kernel lane-select layout (see
    ops/pallas_resblock._edge_kernel)."""
    kh, kw, c, o = k.shape
    e = jnp.zeros((3, f * c, f * o), k.dtype)
    e = e.at[:, :c, (f - 1) * o:].set(k[:, 2])
    e = e.at[:, (f - 1) * c:, :o].set(k[:, 0])
    return e


def _kernel(x_ref, a_ref, e_ref, res_ref, out_ref, buf, sems, *,
            th, wc, total, ni, nj, split, relu, has_res):
    p = pl.program_id(0)

    def dma(slot, q):
        bi = q // (ni * nj)
        r = q % (ni * nj)
        ti = r // nj
        tj = r % nj
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ti * th, th + 2), pl.ds(tj * wc, wc + 16)],
            buf.at[slot], sems.at[slot])

    @pl.when(p == 0)
    def _():
        dma(0, 0).start()

    @pl.when(p + 1 < total)
    def _():
        dma((p + 1) % 2, p + 1).start()

    dma(p % 2, p).wait()
    x = buf[p % 2]                                   # (th+2, wc+16, fC)

    # +-1 cell shifts via positive rolls in f32 (Mosaic: bf16 rotate
    # unsupported; negative sublane shifts on non-pow2 sizes buggy)
    xf = x.astype(jnp.float32)
    m_m1 = pltpu.roll(xf, 1, axis=1)
    m_p1 = pltpu.roll(xf, xf.shape[1] - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 2)
    m = jnp.where(lane >= split, m_m1, m_p1).astype(x.dtype)

    a = a_ref[...]
    e = e_ref[...]
    acc = None
    for ky in range(3):
        t = jax.lax.dot_general(x[ky:ky + th], a[ky], _DN,
                                preferred_element_type=jnp.float32)
        t = t + jax.lax.dot_general(m[ky:ky + th], e[ky], _DN,
                                    preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    out = acc[:, 8:8 + wc].astype(x.dtype)
    if has_res:
        out = out + res_ref[0]
    if relu:
        out = jnp.where(out.astype(jnp.float32) >= 0, out,
                        jnp.asarray(0.2, out.dtype) * out)
    out_ref[0] = out


def _pick(n, target):
    for t in (target, target // 2, target // 4, 8):
        if t and n % t == 0:
            return t
    return 0


def fits(xp: jnp.ndarray, f: int = 2) -> bool:
    b, h, wp, fc = xp.shape
    return (f == 2 and fc % 128 == 0 and _pick(h, 8) >= 8
            and _pick(wp, 128) >= 16)


def _impl(xp, k, res, relu, f=2, interpret=False):
    b, h, wp, fc = xp.shape
    th = _pick(h, 8)
    wc = _pick(wp, 128)
    ni, nj = h // th, wp // wc
    total = b * ni * nj
    dt = xp.dtype
    fo = f * k.shape[3]
    c = k.shape[2]

    xpad = jnp.pad(xp, ((0, 0), (1, 1), (8, 8), (0, 0)))
    ka, _ = ae_kernels_3x3(k, f)
    a = ka[:, 0].astype(dt)
    e = _edge_kernel(k, f).astype(dt)
    has_res = res is not None
    res_in = res if has_res else jnp.zeros((b, 1, 1, fo), dt)

    kern = functools.partial(
        _kernel, th=th, wc=wc, total=total, ni=ni, nj=nj,
        split=(f - 1) * c, relu=relu, has_res=has_res)

    def oidx(p, _ni=ni, _nj=nj):
        r = p % (_ni * _nj)
        return (p // (_ni * _nj), r // _nj, r % _nj, 0)

    res_spec = (pl.BlockSpec((1, th, wc, fo), oidx, memory_space=pltpu.VMEM)
                if has_res else pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  res_spec],
        out_specs=pl.BlockSpec((1, th, wc, fo), oidx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, fo), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wc + 16, fc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, a, e, res_in)


def _ref(xp, k, res, relu, f=2):
    dt = xp.dtype
    out = jax.lax.conv_general_dilated(
        xp, pack_kernel_3x3(k, f).astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)
    if res is not None:
        out = out + res
    if relu:
        out = jnp.where(out >= 0, out, jnp.asarray(0.2, dt) * out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_packed_ae(xp, k, res=None, relu=False, f=2, interpret=False):
    """Width-packed 3x3 SAME conv (+ optional residual + leaky-ReLU).

    xp (B, H, Wp, f*C) packed; k (3, 3, C, O) logical HWIO (no bias — the
    HRNet convs are bias-free); res (B, H, Wp, f*O) or None.
    Exact math vs the XLA packed conv (f32 accumulation, bf16 out).
    """
    return _impl(xp, k, res, relu, f, interpret)


def _fwd(xp, k, res, relu, f, interpret):
    return conv3x3_packed_ae(xp, k, res, relu, f, interpret), (xp, k, res)


def _bwd(relu, f, interpret, resid, g):
    xp, k, res = resid
    if res is None:
        _, vjp = jax.vjp(lambda a, b: _ref(a, b, None, relu, f), xp, k)
        da, db = vjp(g)
        return da, db, None
    _, vjp = jax.vjp(lambda a, b, r: _ref(a, b, r, relu, f), xp, k, res)
    return vjp(g)


conv3x3_packed_ae.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# HWNC variant: the round-2 fix for the relayout failure documented above.
#
# Logical (H, Wp, B, fC) row-major is bit-identical to the {3,0,2,1}
# physical layout XLA assigns the NHWC packed-conv chains (the
# ops/pallas_chain.py discovery), so dropping this kernel between two such
# convs costs ZERO boundary copies — the per-conv insert that regressed
# 29.57 -> 22.31 fps in NHWC becomes a pure padded-FLOP win (6 vs 9
# (fC x fO) dots per cell).  Full-width tiles: W shifts are free slices of
# the untiled cell dim with zero fill (the conv's SAME padding), and the
# H halo arrives via the cross-program double-buffered body+2x1-row DMA of
# ops/pallas_chain._block_kernel_dma (clamped rows zero-masked in-kernel).
# ---------------------------------------------------------------------------


_DN2 = (((1,), (0,)), ((), ()))


def _shift_cells(a, s):
    """SAME-padding W-shift on (th, Wp, B, C): result[:, w] = a[:, w+s]
    with zeros at the border (s in {-1, +1})."""
    z = jnp.zeros_like(a[:, :1])
    if s == 1:
        return jnp.concatenate([a[:, 1:], z], axis=1)
    return jnp.concatenate([z, a[:, :-1]], axis=1)


def _hwnc_kernel(x_ref, a_ref, e_ref, res_ref, *rest, th, n_blocks,
                 split, relu, has_res, has_bias=False):
    if has_bias:
        bias_ref, out_ref = rest[0], rest[1]
        scr, sems = rest[2], rest[3]
    else:
        bias_ref = None
        out_ref = rest[0]
        scr, sems = rest[1], rest[2]
    i = pl.program_id(0)
    h = n_blocks * th

    def copies(slot, q):
        s = q * th
        return (
            pltpu.make_async_copy(
                x_ref.at[pl.ds(s, th)],
                scr.at[slot, pl.ds(1, th)], sems.at[slot, 0]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s - 1, 0, h - 1), 1)],
                scr.at[slot, pl.ds(0, 1)], sems.at[slot, 1]),
            pltpu.make_async_copy(
                x_ref.at[pl.ds(jnp.clip(s + th, 0, h - 1), 1)],
                scr.at[slot, pl.ds(th + 1, 1)], sems.at[slot, 2]),
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
    win = scr[i % 2]                          # (th+2, Wp, B, fC)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1, 1), 0)
    th_, wp, b, fc = th, win.shape[1], win.shape[2], win.shape[3]
    m = th_ * wp * b
    a = a_ref[...]                            # (3, fC, fO)
    e = e_ref[...]                            # (3, fC, fO)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, fc), 3)
    acc = None
    for ky in range(3):
        rows = win[ky:ky + th]
        # clamped halo rows duplicate the border row; the duplicates are
        # exactly the out-of-image taps — zero them (SAME zero padding)
        if ky == 0:
            rows = jnp.where((i == 0) & (row_iota == 0), 0.0, rows)
        if ky == 2:
            rows = jnp.where((i == n_blocks - 1) & (row_iota == th - 1),
                             0.0, rows)
        d = jax.lax.dot_general(rows.reshape(m, fc), a[ky], _DN2,
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
        # E operand: lanes [split:] carry the PREV cell's rows, lanes
        # [:split] the NEXT cell's (matching _edge_kernel's block layout)
        msel = jnp.where(lane >= split, _shift_cells(rows, -1),
                         _shift_cells(rows, 1))
        acc = acc + jax.lax.dot_general(msel.reshape(m, fc), e[ky], _DN2,
                                        preferred_element_type=jnp.float32)
    fo = a.shape[-1]
    if has_bias:
        acc = acc + bias_ref[...].astype(jnp.float32)
    out = acc.astype(out_ref.dtype).reshape(th_, wp, b, fo)
    if has_res:
        out = out + res_ref[...]
    if relu:
        out = jnp.where(out.astype(jnp.float32) >= 0, out,
                        jnp.asarray(0.2, out.dtype) * out)
    out_ref[...] = out


# Batch-aware VMEM gates for the HWNC kernel.  Blocks carry the WHOLE
# batch (B is an inner dim of the HWNC layout, not gridded), so VMEM
# scales linearly with B.  Calibrated against the r3 batch-sweep crash
# at the transition1 call site (x = (512, 512, B, 512) f2):
#   - scratch (2, th+2, wp, b, fc): the SHIPPING bs8/th=4 envelope is
#     exactly 48 MiB; bs16/th=4 doubles it to 96 MiB and the program
#     dies with "Used 191.86M of 128.00M vmem".  Budget: 48 MiB
#     inclusive, so the flagship route is untouched and larger batches
#     shrink th (bs16 fc=512 -> th=1, also exactly 48 MiB).
#   - the crash's 79.86M of register-allocator spill slots scale with
#     the dot working set th*wp*b*fc; the shipping envelope is 16 MiB
#     of bf16 operand rows.  Cap that too (inclusive).
#   - B is the second-minor dim of the (8,128)-tiled layout: Mosaic
#     rejects memref slices whose B extent isn't 8-aligned ("Slice
#     shape along dimension 2 must be aligned to tiling (8), but is
#     12", bs12 sweep log) -> require b % 8 == 0.
# Anything over budget returns 0 -> the caller's XLA fallback, so any
# batch size RUNS.
_SCR_BUDGET = 48 * 2**20
_DOT_BUDGET = 16 * 2**20


def _pick_th(h: int, wp: int = 0, b: int = 0, fc: int = 0,
             esz: int = 2) -> int:
    import os

    order = (4, 2, 8, 1)
    env = os.environ.get("DVIE_AE_TH")
    if env:
        order = (int(env),) + order
    for th in order:
        if not (th and h % th == 0 and h // th >= 2):
            continue
        if wp:
            if 2 * (th + 2) * wp * b * fc * esz > _SCR_BUDGET:
                continue
            if th * wp * b * fc * esz > _DOT_BUDGET:
                continue
        return th
    return 0


def hwnc_fits(x: jnp.ndarray, f: int = 2) -> bool:
    """x logical (H, Wp, B, fC)."""
    h, wp, b, fc = x.shape
    esz = jnp.dtype(x.dtype).itemsize
    th = _pick_th(h, wp, b, fc, esz)
    return (f == 2 and fc % 128 == 0 and b % 8 == 0 and th > 0
            and (wp * b * th) % 8 == 0)


def _impl_hwnc(x, k, res, relu, f=2, interpret=False, bias=None):
    h, wp, b, fc = x.shape
    th = _pick_th(h, wp, b, fc, jnp.dtype(x.dtype).itemsize)
    n_blocks = h // th
    dt = x.dtype
    fo = f * k.shape[3]
    ka, _ = ae_kernels_3x3(k, f)
    a = ka[:, 0].astype(dt)
    e = _edge_kernel(k, f).astype(dt)
    has_res = res is not None
    has_bias = bias is not None
    res_in = res if has_res else jnp.zeros((1, 1, 1, fo), dt)

    kern = functools.partial(
        _hwnc_kernel, th=th, n_blocks=n_blocks,
        split=(f - 1) * k.shape[2], relu=relu, has_res=has_res,
        has_bias=has_bias)

    def tile(c):
        return pl.BlockSpec((th, wp, b, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), w_spec, w_spec,
                tile(fo) if has_res else w_spec]
    args = [x, a, e, res_in]
    if has_bias:
        # bias tiles as (1, fO), packed to the f phases; appended only
        # when present so bias-free callers keep their exact signature
        in_specs.append(w_spec)
        args.append(jnp.tile(bias.reshape(1, -1), (1, f)).astype(dt))
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tile(fo),
        out_shape=jax.ShapeDtypeStruct((h, wp, b, fo), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, b, fc), dt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
        **kwargs,
    )(*args)


def _ref_hwnc(x, k, res, relu, f=2, bias=None):
    dt = x.dtype
    out = jax.lax.conv_general_dilated(
        x, pack_kernel_3x3(k, f).astype(dt), (1, 1), "SAME",
        dimension_numbers=("HWNC", "HWIO", "HWNC"),
        preferred_element_type=dt)
    if bias is not None:
        out = out + jnp.tile(bias.reshape(1, -1), (1, f)).astype(dt)
    if res is not None:
        out = out + res
    if relu:
        out = jnp.where(out >= 0, out, jnp.asarray(0.2, dt) * out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_packed_ae_hwnc(x, k, res=None, relu=False, f=2,
                           interpret=False, bias=None):
    """Width-packed 3x3 SAME conv in HWNC form (+ residual + leaky-ReLU).

    x (H, Wp, B, f*C) logical — row-major-identical to the {3,0,2,1}
    physical layout of the surrounding NHWC packed convs, so boundaries
    are free; k (3, 3, C, O) logical HWIO; res (H, Wp, B, f*O) or None;
    bias (O,) or None (added before the residual/lrelu, the stem-conv
    form).  A+E decomposition: 6 instead of 9 (fC x fO) dots per cell.
    """
    return _impl_hwnc(x, k, res, relu, f, interpret, bias)


def _fwd_hwnc(x, k, res, relu, f, interpret, bias):
    return (conv3x3_packed_ae_hwnc(x, k, res, relu, f, interpret, bias),
            (x, k, res, bias))


def _bwd_hwnc(relu, f, interpret, resid, g):
    x, k, res, bias = resid
    args = [x, k] + [a for a in (res, bias) if a is not None]

    def ref(*a):
        i = 2
        r = a[i] if res is not None else None
        i += 1 if res is not None else 0
        bi = a[i] if bias is not None else None
        return _ref_hwnc(a[0], a[1], r, relu, f, bias=bi)

    _, vjp = jax.vjp(ref, *args)
    grads = list(vjp(g))
    dx, dk = grads[0], grads[1]
    i = 2
    dres = None
    if res is not None:
        dres = grads[i]
        i += 1
    dbias = grads[i] if bias is not None else None
    return dx, dk, dres, dbias


conv3x3_packed_ae_hwnc.defvjp(_fwd_hwnc, _bwd_hwnc)
