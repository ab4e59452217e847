"""Fused Bottleneck block-boundary kernel (HRNet layer1, nets/HRNet.py:47-85).

The layer1 chain's 3x3 convs run at the MXU's padded-FLOP wall, but the
block BOUNDARIES are HBM-bound: at 8x512x1024 bf16 the trace shows each
"conv3 1x1 + residual + lrelu" fusion at ~655 GB/s / 7.4 ms and each next
block's "conv1 1x1" at ~714 GB/s / 3.8 ms — together they stream the fat
packed 512-lane tensor four times (7.3 GB/boundary).  This kernel fuses

    y  = lrelu(h2 @ K3 + residual)        residual = x @ Kres  (or x)
    h1 = lrelu(y @ K1_next)               (omitted at the chain tail)

into ONE row-tiled pass: h2 and x stream in, y and h1 stream out
(5.4 GB/boundary), and y never gets re-read for the next conv1.  All
operands are per-pixel 1x1 matmuls — no halos, no manual DMA; BlockSpec
double-buffers the streams.  f32 accumulation per dot, cast to bf16
immediately after each (the XLA packed path's rounding: its convs emit
bf16 before the residual add).

Differentiable via custom_vjp against the XLA composition.  Measured
in-model: layer1 region 45 -> ~31 ms/step (bench 28.7 -> 30.2 fps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN2 = (((1,), (0,)), ((), ()))


def _lrelu_f32cmp(v):
    # Mosaic rejects bf16 comparisons; compare in f32, select on the value
    return jnp.where(v.astype(jnp.float32) >= 0,
                     v, jnp.asarray(0.2, v.dtype) * v)


def _boundary_kernel(h2_ref, x_ref, k3_ref, kres_ref, k1n_ref,
                     *out_refs, has_res, has_next):
    y_ref = out_refs[0]
    h2 = h2_ref[...]
    out = jax.lax.dot_general(
        h2, k3_ref[...], _DN2,
        preferred_element_type=jnp.float32).astype(h2.dtype)
    x = x_ref[...]
    if has_res:
        out = out + jax.lax.dot_general(
            x, kres_ref[...], _DN2,
            preferred_element_type=jnp.float32).astype(h2.dtype)
    else:
        out = out + x
    out = _lrelu_f32cmp(out)
    y_ref[...] = out
    if has_next:
        h1 = jax.lax.dot_general(
            out, k1n_ref[...], _DN2,
            preferred_element_type=jnp.float32).astype(h2.dtype)
        out_refs[1][...] = _lrelu_f32cmp(h1)


def _pick_rows(m: int) -> int:
    import os

    target = 2048
    env = os.environ.get("DVIE_CHAIN_ROWS")
    if env and int(env) >= 8:
        target = int(env)
    for r in (target, target // 2, 512, 256, 128, 64, 32, 16, 8):
        if r and m % r == 0:
            return r
    return 0


def boundary_fits(h2: jnp.ndarray) -> bool:
    m = h2.shape[0] * h2.shape[1] * h2.shape[2]
    return (_pick_rows(m) >= 64 and h2.shape[-1] % 128 == 0
            and h2.shape[-1] <= 512)


def boundary_fits_rows(x: jnp.ndarray) -> bool:
    """Row-count-only eligibility, for gating BEFORE the stem (whose
    output always carries f*64 = 128 lanes): the leading three dims'
    product is unchanged by the stem convs."""
    return _pick_rows(x.shape[0] * x.shape[1] * x.shape[2]) >= 64


def _boundary_impl(h2, x, k3p, kresp, k1np, interpret=False):
    """h2 (B,H,Wp,fP) post-lrelu conv2 output; x (B,H,Wp,fCin) block input.
    k3p (fP, fO), kresp (fCin, fO) or None, k1np (fO, fPn) or None —
    width-packed 1x1 matmul matrices.  Returns (y, h1_next|None)."""
    b, h, wp, fp = h2.shape
    m = b * h * wp
    rows = _pick_rows(m)
    fo = k3p.shape[1]
    dt = h2.dtype
    has_res = kresp is not None
    has_next = k1np is not None

    h2f = h2.reshape(m, fp)
    xf = x.reshape(m, x.shape[-1])
    kres_in = (kresp if has_res
               else jnp.zeros((x.shape[-1], fo), dt))
    k1n_in = k1np if has_next else jnp.zeros((fo, 128), dt)

    kern = functools.partial(_boundary_kernel, has_res=has_res,
                             has_next=has_next)
    grid = (m // rows,)

    def row_spec(c):
        return pl.BlockSpec((rows, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [row_spec(fo)]
    out_shape = [jax.ShapeDtypeStruct((m, fo), dt)]
    if has_next:
        fpn = k1np.shape[1]
        out_specs.append(row_spec(fpn))
        out_shape.append(jax.ShapeDtypeStruct((m, fpn), dt))
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(fp), row_spec(x.shape[-1]),
                  w_spec, w_spec, w_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(h2f, xf, k3p.astype(dt), kres_in.astype(dt), k1n_in.astype(dt))
    y = outs[0].reshape(b, h, wp, fo)
    h1 = outs[1].reshape(b, h, wp, k1np.shape[1]) if has_next else None
    return y, h1


def _boundary_ref(h2, x, k3p, kresp, k1np):
    """XLA reference (identical rounding: bf16 after each f32-acc dot)."""
    dt = h2.dtype

    def lrelu(v):
        return jnp.where(v >= 0, v, jnp.asarray(0.2, v.dtype) * v)

    out = jax.lax.dot_general(
        h2, k3p.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    if kresp is not None:
        out = out + jax.lax.dot_general(
            x, kresp.astype(dt), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
    else:
        out = out + x
    y = lrelu(out)
    if k1np is None:
        return y, None
    h1 = jax.lax.dot_general(
        y, k1np.astype(dt), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    return y, lrelu(h1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_boundary(h2, x, k3p, kresp, k1np, interpret=False):
    """Fused packed Bottleneck boundary; see module docstring.

    Returns (y, h1_next); ``h1_next`` is None when ``k1np`` is None (the
    chain tail).  ``kresp`` None means identity residual.
    """
    return _boundary_impl(h2, x, k3p, kresp, k1np, interpret=interpret)


def _fb_fwd(h2, x, k3p, kresp, k1np, interpret):
    return (fused_boundary(h2, x, k3p, kresp, k1np, interpret),
            (h2, x, k3p, kresp, k1np))


def _fb_bwd(interpret, res, g):
    h2, x, k3p, kresp, k1np = res
    gy, gh1 = g
    # the pallas fwd returns h1=None at the tail; its cotangent arrives
    # as None/zero — normalize for the vjp closure
    args = [h2, x, k3p]
    if kresp is not None:
        args.append(kresp)
    if k1np is not None:
        args.append(k1np)

    def ref(*a):
        i = 3
        kr = a[i] if kresp is not None else None
        i += 1 if kresp is not None else 0
        kn = a[i] if k1np is not None else None
        y, h1 = _boundary_ref(a[0], a[1], a[2], kr, kn)
        if h1 is None:
            return (y,)
        return (y, h1)

    outs, vjp = jax.vjp(ref, *args)
    cts = (gy,) if k1np is None else (gy, gh1)
    grads = list(vjp(cts))
    dh2, dx, dk3 = grads[0], grads[1], grads[2]
    i = 3
    dkres = None
    if kresp is not None:
        dkres = grads[i]
        i += 1
    dk1n = grads[i] if k1np is not None else None
    return dh2, dx, dk3, dkres, dk1n


fused_boundary.defvjp(_fb_fwd, _fb_bwd)


# ---------------------------------------------------------------------------
# fused_block: the whole Bottleneck tail in one pass (HWNC form).
#
# Measured round 2: replacing only the 1x1 boundaries (fused_boundary)
# under-delivers because XLA was ALREADY fusing each layer1 conv2 into the
# conv3+residual fusion (trace: 897-GFLOP compare_select_fusions at
# ~122 TF/s) — unfusing conv2 into its own op gave back most of the
# boundary win (29.57 -> 29.94 fps only).  This kernel therefore computes
#
#     h2  = lrelu(conv3x3_packed(h1))            (9 row-shifted dots)
#     y   = lrelu(h2 @ K3 + residual)            residual = x @ Kres or x
#     h1n = lrelu(y @ K1_next)                   (omitted at the tail)
#
# in ONE pass over (H, W2, B, C) HWNC tiles: h2 never touches HBM, x and
# h1 stream in once, y/h1n stream out once.  The 3x3's H halo comes from
# passing h1 THREE times at block offsets i-1/i/i+1 (clamped; edge rows
# zeroed in-kernel) — h1 is the thin 128-lane tensor, so the 3x traffic
# costs ~1 GB/block while avoiding manual halo DMA entirely.  W shifts
# are free row-dim slices in the HWNC layout (W2 is an untiled major
# dim), with zero-fill at the borders matching SAME padding.
# ---------------------------------------------------------------------------


def _shift_w(a, s):
    """SAME-padding W-shift on (th, W2, B, C): result[:, w] = a[:, w+s]
    with zeros shifted in at the border (s in {-1, 0, +1})."""
    if s == 0:
        return a
    z = jnp.zeros_like(a[:, :1])
    if s == 1:
        return jnp.concatenate([a[:, 1:], z], axis=1)
    return jnp.concatenate([z, a[:, :-1]], axis=1)


def _block_compute(row_slices, x_ref, k2_ref, k3_ref, kres_ref, k1n_ref,
                   out_refs, *, has_res, has_next, ae=False):
    """Shared fused-block math: ``row_slices(ky) -> (th, w2, b, fp)``
    yields the conv2 operand rows for tap row ky (already border-zeroed).

    ``ae=True`` computes conv2 via the A+E split (6 instead of 9
    (fp x fp) dots — ops/pallas_ae_conv.py): at f=2 the packed kernel's
    center tap k2p[ky, 1] IS the dense A matrix, and k2p[ky, 0] +
    k2p[ky, 2] (disjoint nonzero blocks) IS the E matrix whose operand
    mixes the prev cell's rows in the upper lane half with the next
    cell's in the lower half.  Only valid when k2_ref carries the
    structured zeros of ops/packed_conv.pack_kernel_3x3 (as every real
    caller does) — an arbitrary dense (3, 3, fp, fp) kernel would lose
    its cross-phase cross-cell coefficients."""
    k2 = k2_ref[...]  # (3, 3, fp, fp) packed taps
    th, w2, b, _ = out_refs[0].shape
    m = th * w2 * b
    dt = out_refs[0].dtype
    acc = None
    for ky in range(3):
        rows = row_slices(ky)
        fp = rows.shape[-1]
        if ae:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, fp), 3)
            d = jax.lax.dot_general(
                rows.reshape(m, fp), k2[ky, 1], _DN2,
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            msel = jnp.where(lane >= fp // 2, _shift_w(rows, -1),
                             _shift_w(rows, 1))
            acc = acc + jax.lax.dot_general(
                msel.reshape(m, fp), k2[ky, 0] + k2[ky, 2], _DN2,
                preferred_element_type=jnp.float32)
            continue
        for kx in range(3):
            op = _shift_w(rows, kx - 1).reshape(m, fp)
            d = jax.lax.dot_general(op, k2[ky, kx], _DN2,
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    h2 = _lrelu_f32cmp(acc.astype(dt))

    out = jax.lax.dot_general(
        h2, k3_ref[...], _DN2,
        preferred_element_type=jnp.float32).astype(dt)
    x = x_ref[...].reshape(m, x_ref.shape[-1])
    if has_res:
        out = out + jax.lax.dot_general(
            x, kres_ref[...], _DN2,
            preferred_element_type=jnp.float32).astype(dt)
    else:
        out = out + x
    out = _lrelu_f32cmp(out)
    fo = out.shape[-1]
    out_refs[0][...] = out.reshape(th, w2, b, fo)
    if has_next:
        h1o = jax.lax.dot_general(
            out, k1n_ref[...], _DN2,
            preferred_element_type=jnp.float32).astype(dt)
        out_refs[1][...] = _lrelu_f32cmp(h1o).reshape(
            th, w2, b, k1n_ref.shape[-1])


def _block_kernel(h1p_ref, h1c_ref, h1n_ref, x_ref, k2_ref, k3_ref,
                  kres_ref, k1n_ref, *out_refs, has_res, has_next,
                  n_blocks, ae=False):
    i = pl.program_id(0)
    th = h1c_ref.shape[0]
    cur = h1c_ref[...]
    # window rows h-1 .. h+th: one row each from the prev/next tiles,
    # zeroed at the physical H borders (SAME padding)
    top = jnp.where((i > 0).reshape((1,) * 4), h1p_ref[...][-1:], 0.0)
    bot = jnp.where((i < n_blocks - 1).reshape((1,) * 4),
                    h1n_ref[...][:1], 0.0)
    win = jnp.concatenate([top, cur, bot], axis=0)  # (th+2, w2, b, fp)
    _block_compute(lambda ky: win[ky:ky + th], x_ref, k2_ref, k3_ref,
                   kres_ref, k1n_ref, out_refs,
                   has_res=has_res, has_next=has_next, ae=ae)


def _block_kernel_dma(h1_ref, x_ref, k2_ref, k3_ref, kres_ref, k1n_ref,
                      *rest, has_res, has_next, n_blocks, th, ae=False):
    """fused_block with the h1 halo window DMA'd cross-program
    double-buffered (program i starts i+1's copy) instead of the 3-view
    BlockSpecs: h1 HBM traffic drops from 3x to (th+2)/th, and H is an
    untiled row dim so the window slices need no alignment."""
    n_out = 2 if has_next else 1
    out_refs = rest[:n_out]
    scr, sems = rest[n_out], rest[n_out + 1]
    i = pl.program_id(0)
    h = n_blocks * th

    # three static-size copies per window: the th-row body plus two 1-row
    # halos with border-clamped starts (the clamped duplicate rows are
    # exactly the ones zero-masked below, so the clamp never leaks)
    def copies(slot, q):
        s = q * th
        return (
            pltpu.make_async_copy(
                h1_ref.at[pl.ds(s, th)],
                scr.at[slot, pl.ds(1, th)], sems.at[slot, 0]),
            pltpu.make_async_copy(
                h1_ref.at[pl.ds(jnp.clip(s - 1, 0, h - 1), 1)],
                scr.at[slot, pl.ds(0, 1)], sems.at[slot, 1]),
            pltpu.make_async_copy(
                h1_ref.at[pl.ds(jnp.clip(s + th, 0, h - 1), 1)],
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
    win = scr[i % 2]                       # (th+2, w2, b, fp)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1, 1), 0)

    def row_slices(ky):
        rows = win[ky:ky + th]
        if ky == 0:
            # output row 0's dy=-1 input is global row -1 at the top edge
            rows = jnp.where((i == 0) & (row_iota == 0), 0.0, rows)
        if ky == 2:
            rows = jnp.where((i == n_blocks - 1) & (row_iota == th - 1),
                             0.0, rows)
        return rows

    _block_compute(row_slices, x_ref, k2_ref, k3_ref, kres_ref, k1n_ref,
                   out_refs, has_res=has_res, has_next=has_next, ae=ae)


# VMEM budget for the fused block's resident slabs.  Blocks carry the
# WHOLE batch (B is an inner HWNC dim), so double-buffered scratch +
# x/y/h1n tiles scale linearly with B.  The validated envelope is
# 8x512x1024 f2 layer1 (th=2: scratch 8.4 MiB + tiles ~37.7 MiB under
# the 116 MiB vmem_limit); bs16 doubles everything past the limit (the
# sibling ae_conv kernel measured "191.86M of 128.00M" in the r3 batch
# sweep).  64 MiB admits the validated shapes (and th-shrunk larger
# batches) and rejects the rest -> XLA fallback instead of a crash.
_BLOCK_BUDGET = 64 * 2**20


def _pick_th(h: int, w2: int = 0, b: int = 0, fp: int = 0,
             fcin: int = 512, fo: int = 512, fpn: int = 128,
             esz: int = 2) -> int:
    import os

    order = (2, 4, 8, 1)
    env = os.environ.get("DVIE_BLOCK_TH")
    if env:
        order = (int(env),) + order
    for th in order:
        if not (th and h % th == 0 and h // th >= 2):
            continue
        if w2:
            scr = 2 * (th + 2) * w2 * b * fp * esz
            tiles = 2 * th * w2 * b * (fcin + fo + fpn) * esz
            if scr + tiles > _BLOCK_BUDGET:
                continue
        return th
    return 0


def block_fits(h1: jnp.ndarray, fcin: int = 512, fo: int = 512,
               fpn: int = 128) -> bool:
    h, w2, b, fp = h1.shape
    esz = jnp.dtype(h1.dtype).itemsize
    th = _pick_th(h, w2, b, fp, fcin, fo, fpn, esz)
    # b % 8: B is the second-minor dim of the (8,128)-tiled HWNC layout;
    # Mosaic rejects memref slices with a non-8-aligned B extent (the
    # bs12 sweep failure in the sibling ae_conv kernel).
    return (th > 0 and fp % 128 == 0 and fp <= 512 and b % 8 == 0
            and (w2 * b * th) % 8 == 0)


def _block_impl(h1, x, k2p, k3p, kresp, k1np, interpret=False, ae=False):
    """h1 (H, W2, B, fP) post-lrelu conv1 output; x (H, W2, B, fCin);
    k2p (3, 3, fP, fP) packed 3x3 taps (ops/packed_conv.pack_kernel_3x3);
    k3p (fP, fO); kresp (fCin, fO) | None; k1np (fO, fPn) | None.
    Returns (y, h1_next | None).

    ``ae=True`` computes conv2 via the A+E split (6 vs 9 (fp x fp) dots;
    see _block_compute) — exact ONLY for k2p carrying pack_kernel_3x3's
    structured zeros, so callers must opt in where that holds (the model
    call site gates on DVIE_BLOCK_AE; A/B on TPU @8x512x1024 bf16:
    33.93 off vs 34.07 fps on)."""
    h, w2, b, fp = h1.shape
    fo = k3p.shape[1]
    th = _pick_th(h, w2, b, fp, x.shape[-1], fo,
                  k1np.shape[1] if k1np is not None else 0,
                  jnp.dtype(h1.dtype).itemsize)
    n_blocks = h // th
    dt = h1.dtype
    has_res = kresp is not None
    has_next = k1np is not None

    kres_in = kresp if has_res else jnp.zeros((x.shape[-1], fo), dt)
    k1n_in = k1np if has_next else jnp.zeros((fo, 128), dt)

    import os
    use_dma = os.environ.get("DVIE_BLOCK_DMA", "1") != "0"

    def tile(c, offset):
        return pl.BlockSpec(
            (th, w2, b, c),
            lambda i, o=offset: (jnp.clip(i + o, 0, n_blocks - 1), 0, 0, 0),
            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [tile(fo, 0)]
    out_shape = [jax.ShapeDtypeStruct((h, w2, b, fo), dt)]
    if has_next:
        fpn = k1np.shape[1]
        out_specs.append(tile(fpn, 0))
        out_shape.append(jax.ShapeDtypeStruct((h, w2, b, fpn), dt))
    # the fat 512-lane x/y tiles exceed the default 16 MB scoped-VMEM
    # budget once BlockSpec double-buffers them; raise the per-kernel
    # limit (v5e has 128 MB VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    if use_dma:
        kern = functools.partial(_block_kernel_dma, has_res=has_res,
                                 has_next=has_next, n_blocks=n_blocks,
                                 th=th, ae=ae)
        in_specs = [pl.BlockSpec(memory_space=pl.ANY), tile(x.shape[-1], 0),
                    w_spec, w_spec, w_spec, w_spec]
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((2, th + 2, w2, b, fp), dt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
        args = (h1,)
    else:
        kern = functools.partial(_block_kernel, has_res=has_res,
                                 has_next=has_next, n_blocks=n_blocks,
                                 ae=ae)
        in_specs = [tile(fp, -1), tile(fp, 0), tile(fp, +1),
                    tile(x.shape[-1], 0), w_spec, w_spec, w_spec, w_spec]
        args = (h1, h1, h1)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        **kwargs,
    )(*args, x, k2p.astype(dt), k3p.astype(dt),
      kres_in.astype(dt), k1n_in.astype(dt))
    if has_next:
        return outs[0], outs[1]
    return outs[0], None


def _block_ref(h1, x, k2p, k3p, kresp, k1np):
    """XLA reference (identical rounding: f32-acc convs/dots, bf16 after
    each), HWNC dimension numbers."""
    dt = h1.dtype
    # conv in f32 on upcast inputs == bf16 conv with f32 accumulation
    # (bf16 products are exact in f32), and keeps the VJP dtype-clean
    # (conv's transpose rule rejects mixed bf16/f32 from
    # preferred_element_type upcasting)
    h2 = jax.lax.conv_general_dilated(
        h1.astype(jnp.float32), k2p.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("HWNC", "HWIO", "HWNC")).astype(dt)
    h2 = jnp.where(h2 >= 0, h2, jnp.asarray(0.2, dt) * h2)
    return _boundary_ref(h2, x, k3p, kresp, k1np)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_block(h1, x, k2p, k3p, kresp, k1np, interpret=False, ae=False):
    """Fused conv2 + Bottleneck boundary on HWNC tiles; see above.

    ``ae=True`` is exact only for pack_kernel_3x3-structured k2p
    (see _block_impl)."""
    return _block_impl(h1, x, k2p, k3p, kresp, k1np, interpret=interpret,
                       ae=ae)


def _blk_fwd(h1, x, k2p, k3p, kresp, k1np, interpret, ae):
    return (fused_block(h1, x, k2p, k3p, kresp, k1np, interpret, ae),
            (h1, x, k2p, k3p, kresp, k1np))


def _blk_bwd(interpret, ae, res, g):
    h1, x, k2p, k3p, kresp, k1np = res
    gy, gh1 = g
    args = [h1, x, k2p, k3p]
    if kresp is not None:
        args.append(kresp)
    if k1np is not None:
        args.append(k1np)

    def ref(*a):
        i = 4
        kr = a[i] if kresp is not None else None
        i += 1 if kresp is not None else 0
        kn = a[i] if k1np is not None else None
        y, h1n = _block_ref(a[0], a[1], a[2], a[3], kr, kn)
        if h1n is None:
            return (y,)
        return (y, h1n)

    outs, vjp = jax.vjp(ref, *args)
    cts = (gy,) if k1np is None else (gy, gh1)
    grads = list(vjp(cts))
    dh1, dx, dk2, dk3 = grads[0], grads[1], grads[2], grads[3]
    i = 4
    dkres = None
    if kresp is not None:
        dkres = grads[i]
        i += 1
    dk1n = grads[i] if k1np is not None else None
    return dh1, dx, dk2, dk3, dkres, dk1n


fused_block.defvjp(_blk_fwd, _blk_bwd)
