"""Fused width-packed residual blocks (HRNet layer1 / branch chains).

Profiled on v5e at 8x512x1024 bf16, HRNet's layer1 (4 Bottlenecks,
reference nets/HRNet.py:47-85,375) runs at 45.5 ms against a 23.8 ms
padded-FLOP floor — HBM-bound: XLA materializes every intermediate
(11 convs x 0.5-2.15 GB), ~32 GB of traffic.  Each fused block kernel
makes exactly one pass: read the packed input tile once, keep h1/h2 in
VMEM, write the packed output once (4.3 GB/block).

Inside the kernel the 3x3 uses the A+E decomposition
(ops/packed_conv.ae_kernels_3x3): A = same-cell taps as a dense
(3, fC, fO) per-ky matmul; E = the two cross-cell tap streams, built
with zero lane-slicing via a lane-select between the +-1-cell rolls
(positive `pltpu.roll` only — negative sublane shifts on non-pow2 sizes
are buggy, and the roll wrap never reaches the consumed center).  The
E input materialization that sank the pure-XLA A+E attempt (layer1
45->69 ms) is free here — it lives in VMEM.

Input halo slabs are DMA'd manually with a two-slot cross-program
double buffer (program p starts program p+1's copy before waiting on
its own — scratch and semaphores persist across TPU grid steps);
host-side window materialization, used by ops/pallas_upshead.py for its
10x-smaller parts, would add ~1.2x of the 2.15 GB input per block.

1-pixel borders use the conv's SAME zero padding: the input arrives
zero-padded, and because every conv is bias-free (reference HRNet
convs), zeros propagate exactly (lrelu(0)=0); the BasicBlock masks h1
beyond the image because its first conv is a 3x3 whose out-of-image
rows are contaminated by in-image reads.

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
    pack_kernel_1x1,
    pack_kernel_3x3,
)

_DN = (((2,), (0,)), ((), ()))


def _edge_kernel(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3, fC, fO) E matrix matching the in-kernel lane-select layout:
    lanes [0:C] of the select hold x_{j+1} phase 0 (-> k[:,2] -> out
    phase f-1), lanes [(f-1)C:fC] hold x_{j-1} phase f-1 (-> k[:,0] ->
    out phase 0).  Middle lanes (f>2) are unused (zero rows)."""
    kh, kw, c, o = k.shape
    e = jnp.zeros((3, f * c, f * o), k.dtype)
    e = e.at[:, :c, (f - 1) * o:].set(k[:, 2])
    e = e.at[:, (f - 1) * c:, :o].set(k[:, 0])
    return e


def _bn_kernel(x_ref, k1_ref, a_ref, e_ref, k3_ref, kres_ref, out_ref,
               buf, sems, *, th, wc, total, ni, nj, split, has_res):
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
    x = buf[p % 2]                                   # (th+2, wc+16, fCin)

    h1f = jax.lax.dot_general(x, k1_ref[...], _DN,
                              preferred_element_type=jnp.float32)
    h1f = jnp.where(h1f >= 0, h1f, 0.2 * h1f)
    h1 = h1f.astype(x.dtype)

    # +-1 cell shifts: roll in f32 (Mosaic's dynamic_rotate rejects bf16)
    s = h1f.shape[1]
    m_m1 = pltpu.roll(h1f, 1, axis=1)                # value from cell j-1
    m_p1 = pltpu.roll(h1f, s - 1, axis=1)            # value from cell j+1
    lane = jax.lax.broadcasted_iota(jnp.int32, h1f.shape, 2)
    m = jnp.where(lane >= split, m_m1, m_p1).astype(x.dtype)

    a = a_ref[...]
    e = e_ref[...]
    acc = None
    for ky in range(3):
        t = jax.lax.dot_general(h1[ky:ky + th], a[ky], _DN,
                                preferred_element_type=jnp.float32)
        t = t + jax.lax.dot_general(m[ky:ky + th], e[ky], _DN,
                                    preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    h2 = jnp.where(acc >= 0, acc, 0.2 * acc).astype(x.dtype)
    h2 = h2[:, 8:8 + wc]                             # (th, wc, fP)

    # post-dot math in bf16 (f32 temporaries at f*4P width cost 8+ MB of
    # VMEM and stall the pipeline); rounding matches the XLA packed path,
    # whose convs emit bf16 before the residual add
    out = jax.lax.dot_general(h2, k3_ref[...], _DN,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
    xc = x[1:1 + th, 8:8 + wc]
    if has_res:
        out = out + jax.lax.dot_general(xc, kres_ref[...], _DN,
                                        preferred_element_type=jnp.float32
                                        ).astype(x.dtype)
    else:
        out = out + xc
    # compare in f32 — Mosaic: "Target does not support this comparison"
    # for bf16 operands
    out = jnp.where(out.astype(jnp.float32) >= 0, out,
                    jnp.asarray(0.2, out.dtype) * out)
    out_ref[0] = out.astype(out_ref.dtype)


def _bb_kernel(x_ref, a1_ref, e1_ref, a2_ref, e2_ref, out_ref,
               buf, sems, *, th, wc, total, ni, nj, split, height, wcells):
    p = pl.program_id(0)

    def dma(slot, q):
        bi = q // (ni * nj)
        r = q % (ni * nj)
        ti = r // nj
        tj = r % nj
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ti * th, th + 4), pl.ds(tj * wc, wc + 16)],
            buf.at[slot], sems.at[slot])

    @pl.when(p == 0)
    def _():
        dma(0, 0).start()

    @pl.when(p + 1 < total)
    def _():
        dma((p + 1) % 2, p + 1).start()

    dma(p % 2, p).wait()
    x = buf[p % 2]                                   # (th+4, wc+16, fC)

    def conv_ae(v, a, e, rows_out):
        s = v.shape[1]
        vf = v.astype(jnp.float32)                   # bf16 rotate unsupported
        m_m1 = pltpu.roll(vf, 1, axis=1)
        m_p1 = pltpu.roll(vf, s - 1, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, vf.shape, 2)
        m = jnp.where(lane >= split, m_m1, m_p1).astype(v.dtype)
        acc = None
        for ky in range(3):
            t = jax.lax.dot_general(v[ky:ky + rows_out], a[ky], _DN,
                                    preferred_element_type=jnp.float32)
            t = t + jax.lax.dot_general(m[ky:ky + rows_out], e[ky], _DN,
                                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return acc

    h1 = conv_ae(x, a1_ref[...], e1_ref[...], th + 2)
    h1 = jnp.where(h1 >= 0, h1, 0.2 * h1)
    # zero h1 beyond the image: conv2's SAME pad needs zeros there, but
    # conv1's out-of-image rows/cells read in-image values.  h1 row r is
    # global row ti*th + r - 1; h1 cell c is global cell tj*wc + c - 8.
    r_idx = pl.program_id(0) % (ni * nj) // nj * th
    c_idx = pl.program_id(0) % nj * wc
    grow = (jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0) + r_idx - 1)
    gcol = (jax.lax.broadcasted_iota(jnp.int32, h1.shape, 1) + c_idx - 8)
    inside = ((grow >= 0) & (grow < height) & (gcol >= 0) & (gcol < wcells))
    h1 = (h1 * jnp.where(inside, 1.0, 0.0)).astype(x.dtype)

    acc = conv_ae(h1, a2_ref[...], e2_ref[...], th)
    xc = x[2:2 + th, 8:8 + wc]
    out = acc[:, 8:8 + wc] + xc.astype(jnp.float32)
    out = jnp.where(out >= 0, out, 0.2 * out)
    out_ref[0] = out.astype(out_ref.dtype)


def _pick(n, target):
    for t in (target, target // 2, target // 4, 8):
        if t and n % t == 0:
            return t
    return 0


def fused_bottleneck_fits(xp, f=2):
    b, h, wp, fc = xp.shape
    return (f == 2 and _pick(h, 32) >= 8 and _pick(wp, 64) >= 8
            and fc % 128 == 0 and wp >= 32)


def fused_basicblock_fits(xp, f=2):
    b, h, wp, fc = xp.shape
    return (f == 2 and _pick(h, 32) >= 8 and _pick(wp, 128) >= 8
            and fc % 128 == 0 and wp >= 32)


def _bottleneck_ref(xp, k1, k2, k3, kres, f):
    dt = xp.dtype
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dt)

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    h = lrelu(conv(xp, pack_kernel_1x1(k1, f).astype(dt), padding="VALID"))
    h = lrelu(conv(h, pack_kernel_3x3(k2, f).astype(dt), padding="SAME"))
    out = conv(h, pack_kernel_1x1(k3, f).astype(dt), padding="VALID")
    if kres is not None:
        out = out + conv(xp, pack_kernel_1x1(kres, f).astype(dt), padding="VALID")
    else:
        out = out + xp
    return lrelu(out)


def _basicblock_ref(xp, k1, k2, f):
    dt = xp.dtype
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dt)

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    h = lrelu(conv(xp, pack_kernel_3x3(k1, f).astype(dt), padding="SAME"))
    return lrelu(conv(h, pack_kernel_3x3(k2, f).astype(dt), padding="SAME") + xp)


def _bn_impl(xp, k1, k2, k3, kres, f=2, interpret=False):
    b, h, wp, fcin = xp.shape
    th = _pick(h, 16)
    wc = _pick(wp, 64)
    ni, nj = h // th, wp // wc
    total = b * ni * nj
    dt = xp.dtype
    planes = k2.shape[2]
    fout = f * k3.shape[3]

    xpad = jnp.pad(xp, ((0, 0), (1, 1), (8, 8), (0, 0)))
    k1p = pack_kernel_1x1(k1, f)[0, 0].astype(dt)
    ka, _ = ae_kernels_3x3(k2, f)
    a = ka[:, 0].astype(dt)
    e = _edge_kernel(k2, f).astype(dt)
    k3p = pack_kernel_1x1(k3, f)[0, 0].astype(dt)
    has_res = kres is not None
    kresp = (pack_kernel_1x1(kres, f)[0, 0].astype(dt) if has_res
             else jnp.zeros((fcin, fout), dt))

    kern = functools.partial(
        _bn_kernel, th=th, wc=wc, total=total, ni=ni, nj=nj,
        split=(f - 1) * planes, has_res=has_res)

    def oidx(p, _ni=ni, _nj=nj):
        r = p % (_ni * _nj)
        return (p // (_ni * _nj), r // _nj, r % _nj, 0)

    return pl.pallas_call(
        kern,
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, th, wc, fout), oidx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, fout), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wc + 16, fcin), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, k1p, a, e, k3p, kresp)


def _bb_impl(xp, k1, k2, f=2, interpret=False):
    b, h, wp, fc = xp.shape
    th = _pick(h, 32)
    wc = _pick(wp, 128)
    ni, nj = h // th, wp // wc
    total = b * ni * nj
    dt = xp.dtype
    c = k1.shape[2]

    xpad = jnp.pad(xp, ((0, 0), (2, 2), (8, 8), (0, 0)))
    ka1, _ = ae_kernels_3x3(k1, f)
    ka2, _ = ae_kernels_3x3(k2, f)

    kern = functools.partial(
        _bb_kernel, th=th, wc=wc, total=total, ni=ni, nj=nj,
        split=(f - 1) * c, height=h, wcells=wp)

    def oidx(p, _ni=ni, _nj=nj):
        r = p % (_ni * _nj)
        return (p // (_ni * _nj), r // _nj, r % _nj, 0)

    return pl.pallas_call(
        kern,
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, th, wc, fc), oidx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, fc), dt),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wc + 16, fc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xpad, ka1[:, 0].astype(dt), _edge_kernel(k1, f).astype(dt),
      ka2[:, 0].astype(dt), _edge_kernel(k2, f).astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_bottleneck(xp, k1, k2, k3, kres, f=2):
    """One packed Bottleneck (1x1 -> 3x3 -> 1x1 + residual, lrelu 0.2).

    xp (B, H, Wp, f*Cin) width-packed; k1 (1,1,Cin,P), k2 (3,3,P,P),
    k3 (1,1,P,4P), kres (1,1,Cin,4P) or None (identity residual).
    Returns the packed (B, H, Wp, f*4P) block output.
    """
    return _bn_impl(xp, k1, k2, k3, kres, f)


def _bn_fwd(xp, k1, k2, k3, kres, f):
    return fused_bottleneck(xp, k1, k2, k3, kres, f), (xp, k1, k2, k3, kres)


def _bn_bwd(f, res, g):
    xp, k1, k2, k3, kres = res
    if kres is None:
        _, vjp = jax.vjp(lambda x, a, b_, c: _bottleneck_ref(x, a, b_, c, None, f),
                         xp, k1, k2, k3)
        dx, d1, d2, d3 = vjp(g)
        return dx, d1, d2, d3, None
    _, vjp = jax.vjp(lambda x, a, b_, c, r: _bottleneck_ref(x, a, b_, c, r, f),
                     xp, k1, k2, k3, kres)
    return vjp(g)


fused_bottleneck.defvjp(_bn_fwd, _bn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_basicblock(xp, k1, k2, f=2):
    """One packed BasicBlock (3x3 -> 3x3 + identity residual, lrelu 0.2)."""
    return _bb_impl(xp, k1, k2, f)


def _bb_fwd(xp, k1, k2, f):
    return fused_basicblock(xp, k1, k2, f), (xp, k1, k2)


def _bb_bwd(f, res, g):
    xp, k1, k2 = res
    _, vjp = jax.vjp(lambda x, a, b_: _basicblock_ref(x, a, b_, f), xp, k1, k2)
    return vjp(g)


fused_basicblock.defvjp(_bb_fwd, _bb_bwd)
