"""Fused fwd+bwd packed kernels for the stem/layer1 train chain.

Target: the 128x128 bs32 training recipe (reference cmd:160-162; train
step nets/HRNet.py:367-375 stem + 4 Bottlenecks, HRNet.py:47-85), where
the r4 train-step trace shows the stem+layer1 region at ~43 ms of the
138 ms step — all of it plain unpacked XLA convs at <=64-channel lane
utilization, streaming every intermediate activation (h1, h2, block
outputs) through HBM in both the forward and the backward
(docs/TRAINBENCH_r4.md names "fused fwd+bwd Pallas chain kernels" as the
one lever its 44.4%-MFU op-graph roofline leaves open).

Design (TPU-first, not a translation):

- Everything runs width-packed at f=2 (ops/packed_conv.py): the 64-ch
  planes become 128 MXU lanes, exact math.  Packing/unpacking of
  activations and weights happens OUTSIDE the kernels as differentiable
  jnp ops, so the custom_vjp pair operates purely in packed space and
  JAX's autodiff maps packed weight grads back to logical kernels for
  free (the packers are linear).
- At 128x128 one batch element's full spatial plane fits in VMEM
  ((H, W/2) = (128, 64)), so the grid runs over BATCH ONLY — no halo
  logic, no tile-boundary double counting for weight grads.  3x3 convs
  are 9 shifted (m, C)@(C, O) dots with zero-fill SAME borders.
- Forward kernels write ONLY the block output; h1/h2 never touch HBM.
- Backward kernels RECOMPUTE h1/h2/pre-activations in VMEM from the
  saved block input, then produce dx (bf16) and f32 weight-grad
  PARTIALS in one pass — one grid-indexed partial block per program,
  summed by XLA outside.  (The first build accumulated into
  constant-index blocks revisited across the grid; that form corrupted
  an UNRELATED buffer in one bs32 composition while passing every
  standalone check, and the partials form also measured faster —
  docs/TRAINBENCH_r5.md "accumulator corruption episode".  The
  revisited-accumulator pattern is banned from these kernels.)
- Weights stream in as f32 (the master dtype) and are cast to the
  compute dtype in-kernel; weight grads come back f32 — same accuracy
  story as the r4 explicit head backward (ops/pallas_upshead.py).

Numerics match the XLA composition's rounding: f32-accumulated dots cast
to the compute dtype at each op boundary, bf16 adds for bias/residual,
LeakyReLU masks from the recomputed pre-activation signs (lrelu is
sign-preserving, so post-activation signs are equivalent).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = (((1,), (0,)), ((), ()))    # (m,K)@(K,N) -> (m,N)
_DN_T = (((1,), (1,)), ((), ()))  # (m,N)@(K,N) -> (m,K)   (times W^T)
_DN_W = (((0,), (0,)), ((), ()))  # (m,K),(m,N) -> (K,N)   (weight grad)

_NEG_SLOPE = 0.2


def _lrelu(v):
    # Mosaic rejects bf16 comparisons; compare in f32, select on the value
    return jnp.where(v.astype(jnp.float32) >= 0,
                     v, jnp.asarray(_NEG_SLOPE, v.dtype) * v)


def _masked(pre, g):
    """lrelu vjp: d(pre) given upstream g and the pre-activation values."""
    return jnp.where(pre.astype(jnp.float32) >= 0,
                     g, jnp.asarray(_NEG_SLOPE, g.dtype) * g)


def _shift(a, axis, s):
    """result[i] = a[i+s] along ``axis`` with zero fill (s in {-1,0,1})."""
    if s == 0:
        return a
    z_shape = list(a.shape)
    z_shape[axis] = 1
    z = jnp.zeros(z_shape, a.dtype)
    if s == 1:
        return jnp.concatenate(
            [lax.slice_in_dim(a, 1, None, axis=axis), z], axis)
    return jnp.concatenate(
        [z, lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)], axis)


def _conv9(x4, k2):
    """SAME 3x3 conv as 9 shifted dots; x4 (b,H,W2,C), k2 (3,3,C,O) in the
    compute dtype.  Returns f32 (m, O)."""
    b, h, w2, c = x4.shape
    m = b * h * w2
    acc = None
    for ky in range(3):
        rh = _shift(x4, 1, ky - 1)
        for kx in range(3):
            op = _shift(rh, 2, kx - 1).reshape(m, c)
            d = lax.dot_general(op, k2[ky, kx], _DN,
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 3)


def _conv9_ae(x4, k2):
    """A+E form of _conv9 for pack_kernel_3x3-structured square taps
    (6 (C,C) dots instead of 9 — the dense-packed form spends 2x logical
    FLOPs on structured zeros; see ops/pallas_ae_conv.py).  Exact ONLY
    for packed kernels (disjoint nonzero blocks in taps 0/2)."""
    b, h, w2, c = x4.shape
    m = b * h * w2
    lane = _lane_iota((1, 1, 1, c))
    acc = None
    for ky in range(3):
        rows = _shift(x4, 1, ky - 1)
        d = lax.dot_general(rows.reshape(m, c), k2[ky, 1], _DN,
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
        msel = jnp.where(lane >= c // 2, _shift(rows, 2, -1),
                         _shift(rows, 2, 1))
        acc = acc + lax.dot_general(
            msel.reshape(m, c), k2[ky, 0] + k2[ky, 2], _DN,
            preferred_element_type=jnp.float32)
    return acc


def _conv9_ae_t(g4, k2):
    """Input-grad of _conv9_ae: invert the lane-select/shift composition
    (upper-lane dmsel came from rows[w-1] -> scatter back at w+1; lower
    from rows[w+1] -> back at w-1), then the H-unshift per tap row."""
    b, h, w2, co = g4.shape
    ci = k2.shape[2]
    m = b * h * w2
    lane = _lane_iota((1, 1, 1, ci))
    acc = None
    for ky in range(3):
        q = _shift(g4, 1, 1 - ky)
        qf = q.reshape(m, co)
        d = lax.dot_general(qf, k2[ky, 1], _DN_T,
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
        dmsel = lax.dot_general(
            qf, k2[ky, 0] + k2[ky, 2], _DN_T,
            preferred_element_type=jnp.float32).reshape(b, h, w2, ci)
        up = jnp.where(lane >= ci // 2, dmsel, 0.0)
        lo = jnp.where(lane < ci // 2, dmsel, 0.0)
        acc = acc + (_shift(up, 2, 1) + _shift(lo, 2, -1)).reshape(m, ci)
    return acc


def _conv9_ae_wgrad(x4, dpre):
    """Weight grads in A+E form: dA -> tap 1, dE -> taps 0 AND 2 (their
    logical coefficients live at disjoint packed positions, so the
    pack_kernel_3x3 vjp outside selects each from its one home)."""
    b, h, w2, c = x4.shape
    m = b * h * w2
    dp = dpre.astype(x4.dtype)
    lane = _lane_iota((1, 1, 1, c))
    taps = []
    for ky in range(3):
        rows = _shift(x4, 1, ky - 1)
        da = lax.dot_general(rows.reshape(m, c), dp, _DN_W,
                             preferred_element_type=jnp.float32)
        msel = jnp.where(lane >= c // 2, _shift(rows, 2, -1),
                         _shift(rows, 2, 1))
        de = lax.dot_general(msel.reshape(m, c), dp, _DN_W,
                             preferred_element_type=jnp.float32)
        taps.append(jnp.stack([de, da, de]))
    return jnp.stack(taps)


def _ae_ok(k2_shape, packed: bool = True) -> bool:
    """A+E applies ONLY to pack_kernel_3x3-structured taps (``packed`` —
    an arbitrary dense 3x3 kernel would lose its cross-cell terms), and
    only square even-lane ones (the stem conv1's 28-lane taps stay on
    the dense path)."""
    return (packed and k2_shape[2] == k2_shape[3] and k2_shape[2] % 2 == 0
            and k2_shape[2] >= 128
            and os.environ.get("DVIE_TRAINCHAIN_AE", "1") != "0")


def _conv9_t(g4, k2):
    """Transpose (input-grad) of _conv9: g4 (b,H,W2,O) -> f32 (m, C)."""
    b, h, w2, o = g4.shape
    m = b * h * w2
    acc = None
    for ky in range(3):
        rh = _shift(g4, 1, 1 - ky)
        for kx in range(3):
            op = _shift(rh, 2, 1 - kx).reshape(m, o)
            d = lax.dot_general(op, k2[ky, kx], _DN_T,
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    return acc


def _conv9_wgrad(x4, dpre):
    """Per-tap weight grads: x4 (b,H,W2,C), dpre (m,O) f32-accumulated.
    Returns (3,3,C,O) f32 stacked."""
    b, h, w2, c = x4.shape
    m = b * h * w2
    dp = dpre.astype(x4.dtype)
    taps = []
    for ky in range(3):
        rh = _shift(x4, 1, ky - 1)
        row = []
        for kx in range(3):
            op = _shift(rh, 2, kx - 1).reshape(m, c)
            row.append(lax.dot_general(op, dp, _DN_W,
                                       preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row))
    return jnp.stack(taps)


def _conv3x3(x4, k2, packed: bool = True):
    return (_conv9_ae(x4, k2) if _ae_ok(k2.shape, packed)
            else _conv9(x4, k2))


def _conv3x3_t(g4, k2, packed: bool = True):
    return (_conv9_ae_t(g4, k2) if _ae_ok(k2.shape, packed)
            else _conv9_t(g4, k2))


def _conv3x3_wgrad(x4, dpre, k2, packed: bool = True):
    return (_conv9_ae_wgrad(x4, dpre) if _ae_ok(k2.shape, packed)
            else _conv9_wgrad(x4, dpre))


# ---------------------------------------------------------------------------
# Bottleneck block (HRNet.py:47-85): h1 = lrelu(x@K1); h2 = lrelu(3x3(h1));
# y = lrelu(h2@K3 + (x@Kres | x))
# ---------------------------------------------------------------------------


def _bn_fwd_kernel(x_ref, k1_ref, k2_ref, k3_ref, kres_ref, y_ref, *,
                   has_res):
    dt = y_ref.dtype
    x4 = x_ref[...]
    b, h, w2, ci = x4.shape
    m = b * h * w2
    xf = x4.reshape(m, ci)
    k1 = k1_ref[...].astype(dt)
    h1 = _lrelu(lax.dot_general(
        xf, k1, _DN, preferred_element_type=jnp.float32).astype(dt))
    h2 = _lrelu(_conv3x3(h1.reshape(b, h, w2, k1.shape[1]),
                         k2_ref[...].astype(dt)).astype(dt))
    out = lax.dot_general(h2, k3_ref[...].astype(dt), _DN,
                          preferred_element_type=jnp.float32).astype(dt)
    if has_res:
        res = lax.dot_general(xf, kres_ref[...].astype(dt), _DN,
                              preferred_element_type=jnp.float32).astype(dt)
    else:
        res = xf
    y_ref[...] = _lrelu(out + res).reshape(b, h, w2, out.shape[-1])


def _bn_bwd_kernel(x_ref, dy_ref, k1_ref, k2_ref, k3_ref, kres_ref,
                   dx_ref, dk1_ref, dk2_ref, dk3_ref, dkres_ref, *,
                   has_res):
    dt = dx_ref.dtype
    x4 = x_ref[...]
    b, h, w2, ci = x4.shape
    m = b * h * w2
    xf = x4.reshape(m, ci)
    k1 = k1_ref[...].astype(dt)
    k2 = k2_ref[...].astype(dt)
    k3 = k3_ref[...].astype(dt)
    cp = k1.shape[1]

    # recompute the forward in VMEM (identical rounding to _bn_fwd_kernel)
    h1 = _lrelu(lax.dot_general(
        xf, k1, _DN, preferred_element_type=jnp.float32).astype(dt))
    h1_4 = h1.reshape(b, h, w2, cp)
    h2 = _lrelu(_conv3x3(h1_4, k2).astype(dt))
    out = lax.dot_general(h2, k3, _DN,
                          preferred_element_type=jnp.float32).astype(dt)
    if has_res:
        res = lax.dot_general(xf, kres_ref[...].astype(dt), _DN,
                              preferred_element_type=jnp.float32).astype(dt)
    else:
        res = xf
    pre_y = out + res

    dy = dy_ref[...].reshape(m, pre_y.shape[-1])
    dpre_y = _masked(pre_y, dy)
    # per-program weight-grad partials, summed by XLA outside: the
    # revisited-constant accumulator form measurably corrupted an
    # unrelated buffer in one bs32 composition (see the DVIE_BBCHAIN
    # note in models/hrnet.py) — banned from every chain kernel
    dk3_ref[0] = lax.dot_general(
        h2, dpre_y, _DN_W, preferred_element_type=jnp.float32)
    dh2 = lax.dot_general(dpre_y, k3, _DN_T,
                          preferred_element_type=jnp.float32).astype(dt)
    dpre2 = _masked(h2, dh2)
    dpre2_4 = dpre2.reshape(b, h, w2, cp)
    dk2_ref[0] = _conv3x3_wgrad(h1_4, dpre2.astype(jnp.float32), k2)
    dh1 = _conv3x3_t(dpre2_4, k2).astype(dt)
    dpre1 = _masked(h1, dh1)
    dk1_ref[0] = lax.dot_general(
        xf, dpre1, _DN_W, preferred_element_type=jnp.float32)
    dx = lax.dot_general(dpre1, k1, _DN_T,
                         preferred_element_type=jnp.float32)
    if has_res:
        kres = kres_ref[...].astype(dt)
        dkres_ref[0] = lax.dot_general(
            xf, dpre_y, _DN_W, preferred_element_type=jnp.float32)
        dx = dx + lax.dot_general(dpre_y, kres, _DN_T,
                                  preferred_element_type=jnp.float32)
    else:
        dx = dx + dpre_y.astype(jnp.float32)
    dx_ref[...] = dx.astype(dt).reshape(b, h, w2, ci)


def _pick_bt(batch: int, h: int, w2: int, ci: int, co: int,
             esz: int = 2) -> int:
    """Largest batch tile whose bwd working set fits the VMEM budget."""
    env = os.environ.get("DVIE_TRAINCHAIN_BT")
    budget = 112 * 2**20
    plane = h * w2 * esz
    for bt in ([int(env)] if env else []) + [8, 4, 2, 1]:
        if bt <= 0 or batch % bt:
            continue
        streams = 2 * bt * plane * (2 * ci + co)        # x, dx dbuf + dy
        transients = bt * plane * (2 * 128 * esz + co * esz + 512 * 4)
        if streams + transients < budget:
            return bt
    return 0


def _pick_bt_fwd(batch: int, h: int, w2: int, ci: int, co: int,
                 esz: int = 2) -> int:
    """Forward-kernel batch tile: only x/y stream and the interiors are
    transient, so the tile can be several times the backward's (bigger
    M per dot).  Same conservative ~2.8x-headroom budgeting."""
    env = os.environ.get("DVIE_TRAINCHAIN_BT_FWD")
    if env and int(env) > 0 and batch % int(env) == 0:
        return int(env)   # authoritative A/B override (compiler OOMs loudly)
    budget = 40 * 2**20
    plane = h * w2 * esz
    for bt in (8, 4, 2, 1):
        if batch % bt:
            continue
        streams = 2 * bt * plane * (ci + co)
        transients = bt * plane * (2 * 128 * esz + co * 4)
        if streams + transients < budget:
            return bt
    return 0


def fits(x: jnp.ndarray, f: int = 2, dtype=None) -> bool:
    """Eligibility for the packed train-chain kernels: packed plane per
    batch element must fit VMEM (true at 128x128; false at 512x1024,
    which keeps the existing HWNC inference chain).

    ``dtype`` is the COMPUTE dtype the chain will run in (the carrier
    ``x`` may still be f32 before the in-chain cast — sizing on it
    would double the VMEM estimate and wrongly reject bf16 runs)."""
    if x.ndim != 4 or x.shape[2] % f:
        return False
    b, h, w, _ = x.shape
    w2 = w // f
    return (w2 % 8 == 0 and h >= 8
            and _pick_bt(b, h, w2, 512, 512,
                         jnp.dtype(dtype or x.dtype).itemsize) > 0)


def _tile_spec(bt, h, w2):
    def tile(c):
        return pl.BlockSpec((bt, h, w2, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def packed_bottleneck(xp, k1p, k2p, k3p, kresp, interpret=False):
    """One packed Bottleneck: xp (B,H,W2,fCi) compute-dtype; k1p (fCi,fP),
    k2p (3,3,fP,fP), k3p (fP,fCo), kresp (fCi,fCo)|None — all f32 packed
    (pack_kernel_* applied outside, differentiable)."""
    return _bn_fwd_impl(xp, k1p, k2p, k3p, kresp, interpret)


def _bn_fwd_impl(xp, k1p, k2p, k3p, kresp, interpret):
    b, h, w2, ci = xp.shape
    co = k3p.shape[-1]
    dt = xp.dtype
    bt = (_pick_bt_fwd(b, h, w2, ci, co, jnp.dtype(dt).itemsize)
          or _pick_bt(b, h, w2, ci, co, jnp.dtype(dt).itemsize))
    has_res = kresp is not None
    kres_in = kresp if has_res else jnp.zeros((ci, co), k3p.dtype)
    tile = _tile_spec(bt, h, w2)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_bn_fwd_kernel, has_res=has_res),
        grid=(b // bt,),
        in_specs=[tile(ci), w_spec, w_spec, w_spec, w_spec],
        out_specs=tile(co),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, co), dt),
        interpret=interpret,
        **kwargs,
    )(xp, k1p, k2p, k3p, kres_in)


def _bn_vjp_fwd(xp, k1p, k2p, k3p, kresp, interpret):
    return (_bn_fwd_impl(xp, k1p, k2p, k3p, kresp, interpret),
            (xp, k1p, k2p, k3p, kresp))


def _bn_vjp_bwd(interpret, res, dy):
    xp, k1p, k2p, k3p, kresp = res
    b, h, w2, ci = xp.shape
    co = k3p.shape[-1]
    cp = k1p.shape[-1]
    dt = xp.dtype
    bt = _pick_bt(b, h, w2, ci, co, jnp.dtype(dt).itemsize)
    has_res = kresp is not None
    kres_in = kresp if has_res else jnp.zeros((ci, co), k3p.dtype)
    tile = _tile_spec(bt, h, w2)
    n_prog = b // bt

    def part(shape):
        nd = len(shape) + 1
        return pl.BlockSpec((1,) + shape, lambda i, _n=nd: (i,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = (tile(ci), part((ci, cp)), part((3, 3, cp, cp)),
                 part((cp, co)), part((ci, co)))
    out_shape = (jax.ShapeDtypeStruct((b, h, w2, ci), dt),
                 jax.ShapeDtypeStruct((n_prog, ci, cp), jnp.float32),
                 jax.ShapeDtypeStruct((n_prog, 3, 3, cp, cp), jnp.float32),
                 jax.ShapeDtypeStruct((n_prog, cp, co), jnp.float32),
                 jax.ShapeDtypeStruct((n_prog, ci, co), jnp.float32))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    dx, dk1, dk2, dk3, dkres = pl.pallas_call(
        functools.partial(_bn_bwd_kernel, has_res=has_res),
        grid=(n_prog,),
        in_specs=[tile(ci), tile(co), w_spec, w_spec, w_spec, w_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(xp, dy, k1p, k2p, k3p, kres_in)
    dk1 = dk1.sum(axis=0).astype(k1p.dtype)
    dk2 = dk2.sum(axis=0).astype(k2p.dtype)
    dk3 = dk3.sum(axis=0).astype(k3p.dtype)
    dkres = dkres.sum(axis=0).astype(k3p.dtype) if has_res else None
    return dx, dk1, dk2, dk3, dkres


packed_bottleneck.defvjp(_bn_vjp_fwd, _bn_vjp_bwd)


# ---------------------------------------------------------------------------
# Stem: s1 = lrelu(3x3(x) + b1); s2 = lrelu(3x3(s1) + b2)
# (nets/HRNet.py:367-373, biased convs)
# ---------------------------------------------------------------------------


def _stem_fwd_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, s2_ref):
    dt = s2_ref.dtype
    x4 = x_ref[...]
    b, h, w2, ci = x4.shape
    cp = k1_ref.shape[-1]
    s1 = _lrelu(_conv9(x4, k1_ref[...].astype(dt)).astype(dt)
                + b1_ref[...].astype(dt))
    pre2 = (_conv3x3(s1.reshape(b, h, w2, cp), k2_ref[...].astype(dt))
            .astype(dt) + b2_ref[...].astype(dt))
    s2_ref[...] = _lrelu(pre2).reshape(b, h, w2, cp)


def _stem_bwd_kernel(x_ref, dy_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                     dx_ref, dk1_ref, db1_ref, dk2_ref, db2_ref):
    dt = dx_ref.dtype
    x4 = x_ref[...]
    b, h, w2, ci = x4.shape
    m = b * h * w2
    k1 = k1_ref[...].astype(dt)
    k2 = k2_ref[...].astype(dt)
    cp = k1.shape[-1]

    pre1 = (_conv9(x4, k1).astype(dt)
            + b1_ref[...].astype(dt))
    s1 = _lrelu(pre1)
    s1_4 = s1.reshape(b, h, w2, cp)
    pre2 = _conv3x3(s1_4, k2).astype(dt) + b2_ref[...].astype(dt)

    dy = dy_ref[...].reshape(m, cp)
    dpre2 = _masked(pre2, dy)
    # per-program partials (see _bn_bwd_kernel note)
    db2_ref[0] = jnp.sum(dpre2.astype(jnp.float32), axis=0, keepdims=True)
    dk2_ref[0] = _conv3x3_wgrad(s1_4, dpre2.astype(jnp.float32), k2)
    ds1 = _conv3x3_t(dpre2.reshape(b, h, w2, cp), k2).astype(dt)
    dpre1 = _masked(pre1, ds1)
    db1_ref[0] = jnp.sum(dpre1.astype(jnp.float32), axis=0, keepdims=True)
    dk1_ref[0] = _conv9_wgrad(x4, dpre1.astype(jnp.float32))
    dx = _conv9_t(dpre1.reshape(b, h, w2, cp), k1)
    dx_ref[...] = dx.astype(dt).reshape(b, h, w2, ci)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def packed_stem(xp, k1p, b1p, k2p, b2p, interpret=False):
    """Both stem convs in one pass; xp (B,H,W2,fCi) compute dtype, packed
    f32 weights/biases (b*p shaped (1, fP))."""
    return _stem_fwd_impl(xp, k1p, b1p, k2p, b2p, interpret)


def _stem_fwd_impl(xp, k1p, b1p, k2p, b2p, interpret):
    b, h, w2, ci = xp.shape
    cp = k1p.shape[-1]
    dt = xp.dtype
    bt = (_pick_bt_fwd(b, h, w2, ci, cp, jnp.dtype(dt).itemsize)
          or _pick_bt(b, h, w2, ci, cp, jnp.dtype(dt).itemsize))
    tile = _tile_spec(bt, h, w2)
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        _stem_fwd_kernel,
        grid=(b // bt,),
        in_specs=[tile(ci)] + [w_spec] * 4,
        out_specs=tile(cp),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, cp), dt),
        interpret=interpret,
        **kwargs,
    )(xp, k1p, b1p, k2p, b2p)


def _stem_vjp_fwd(xp, k1p, b1p, k2p, b2p, interpret):
    return (_stem_fwd_impl(xp, k1p, b1p, k2p, b2p, interpret),
            (xp, k1p, b1p, k2p, b2p))


def _stem_vjp_bwd(interpret, res, dy):
    xp, k1p, b1p, k2p, b2p = res
    b, h, w2, ci = xp.shape
    cp = k1p.shape[-1]
    dt = xp.dtype
    bt = _pick_bt(b, h, w2, ci, cp, jnp.dtype(dt).itemsize)
    tile = _tile_spec(bt, h, w2)
    n_prog = b // bt

    def part(shape):
        nd = len(shape) + 1
        return pl.BlockSpec((1,) + shape, lambda i, _n=nd: (i,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    dx, dk1, db1, dk2, db2 = pl.pallas_call(
        _stem_bwd_kernel,
        grid=(n_prog,),
        in_specs=[tile(ci), tile(cp)] + [w_spec] * 4,
        out_specs=(tile(ci), part((3, 3, ci, cp)), part((1, cp)),
                   part((3, 3, cp, cp)), part((1, cp))),
        out_shape=(jax.ShapeDtypeStruct((b, h, w2, ci), dt),
                   jax.ShapeDtypeStruct((n_prog, 3, 3, ci, cp), jnp.float32),
                   jax.ShapeDtypeStruct((n_prog, 1, cp), jnp.float32),
                   jax.ShapeDtypeStruct((n_prog, 3, 3, cp, cp), jnp.float32),
                   jax.ShapeDtypeStruct((n_prog, 1, cp), jnp.float32)),
        interpret=interpret,
        **kwargs,
    )(xp, dy, k1p, b1p, k2p, b2p)
    return (dx, dk1.sum(axis=0).astype(k1p.dtype),
            db1.sum(axis=0).astype(b1p.dtype),
            dk2.sum(axis=0).astype(k2p.dtype),
            db2.sum(axis=0).astype(b2p.dtype))


packed_stem.defvjp(_stem_vjp_fwd, _stem_vjp_bwd)


# ---------------------------------------------------------------------------
# BasicBlock chain (nets/HRNet.py:15-44): N x [h = lrelu(3x3(x));
# y = lrelu(3x3(h) + x)] at uniform channels — the per-stage branch
# chains (HighResolutionModule).  Branch 0 runs width-packed (A+E taps);
# branches 1/2 run unpacked (their 128/256 channels already fill lanes).
# ---------------------------------------------------------------------------


def _bb_fwd_kernel(x_ref, *rest, n_blocks, packed):
    y_ref = rest[n_blocks * 2]
    dt = y_ref.dtype
    x4 = x_ref[...]
    for i in range(n_blocks):
        k1 = rest[2 * i][...].astype(dt)
        k2 = rest[2 * i + 1][...].astype(dt)
        h = _lrelu(_conv3x3(x4, k1, packed).astype(dt))
        h4 = h.reshape(x4.shape[:3] + (k1.shape[-1],))
        pre = _conv3x3(h4, k2, packed).astype(dt).reshape(x4.shape)
        x4 = _lrelu(pre + x4)
    y_ref[...] = x4


def _bb_bwd_kernel(x_ref, dy_ref, *rest, n_blocks, packed):
    dx_ref = rest[n_blocks * 2]
    dk_refs = rest[n_blocks * 2 + 1:]
    dt = dx_ref.dtype
    x4 = x_ref[...]
    shp = x4.shape
    m = shp[0] * shp[1] * shp[2]

    ks = [rest[j][...].astype(dt) for j in range(2 * n_blocks)]
    # forward recompute keeping every block input (all VMEM-resident)
    xs = [x4]
    for i in range(n_blocks):
        h = _lrelu(_conv3x3(xs[i], ks[2 * i], packed).astype(dt))
        h4 = h.reshape(shp)
        pre = _conv3x3(h4, ks[2 * i + 1], packed).astype(dt).reshape(shp)
        xs.append(_lrelu(pre + xs[i]))

    dy = dy_ref[...].reshape(m, shp[-1])
    for i in reversed(range(n_blocks)):
        x_i = xs[i]
        h = _lrelu(_conv3x3(x_i, ks[2 * i], packed).astype(dt))
        h4 = h.reshape(shp)
        # xs[i+1] = lrelu(pre_y): sign-equivalent mask source
        dpre_y = _masked(xs[i + 1].reshape(m, shp[-1]), dy)
        dpre_y4 = dpre_y.reshape(shp)
        # per-program dk partials (grid-indexed blocks, summed by XLA
        # outside) instead of the revisited-constant accumulators the
        # bottleneck kernels use: with the accumulators this kernel's
        # in-model composition at bs32 corrupted an UNRELATED buffer
        # (the seg logits feeding CE) while every standalone check
        # passed — see models/hrnet.py DVIE_BBCHAIN note
        dk_refs[2 * i + 1][0] = _conv3x3_wgrad(
            h4, dpre_y.astype(jnp.float32), ks[2 * i + 1], packed)
        dh = _conv3x3_t(dpre_y4, ks[2 * i + 1], packed).astype(dt)
        dpre_h = _masked(h, dh)
        dk_refs[2 * i][0] = _conv3x3_wgrad(
            x_i, dpre_h.astype(jnp.float32), ks[2 * i], packed)
        dx = _conv3x3_t(dpre_h.reshape(shp), ks[2 * i], packed)
        dy = (dx + dpre_y.astype(jnp.float32)).astype(dt)
    dx_ref[...] = dy.reshape(shp)


def _bb_pick_bt(batch, h, w2, c, n_blocks, esz):
    env = os.environ.get("DVIE_TRAINCHAIN_BT")
    # Conservative: the bwd kernel keeps the whole xs list live across
    # the unrolled backward walk plus ~4 plane-sized f32 transients per
    # conv group; the measured envelope (bs32 128x128 branch-0, r5) blew
    # a 100 MiB estimate at 173 MiB actual, so the estimate headroom is
    # ~2.8x — budget accordingly.
    budget = 40 * 2**20
    plane = h * w2 * c * esz
    for bt in ([int(env)] if env else []) + [8, 4, 2, 1]:
        if bt <= 0 or batch % bt:
            continue
        streams = 2 * bt * plane * 3               # x, dy, dx double-buffered
        resident = bt * plane * (n_blocks + 3)     # xs list + h + grads
        weights = 2 * n_blocks * 9 * c * c * 4 * 2  # ks + dks (f32)
        if streams + resident + weights < budget:
            return bt
    return 0


def bb_fits(x: jnp.ndarray, n_blocks: int, dtype=None) -> bool:
    if x.ndim != 4:
        return False
    b, h, w2, c = x.shape
    return (w2 % 8 == 0 and h >= 8 and c % 128 == 0
            and _bb_pick_bt(b, h, w2, c, n_blocks,
                            jnp.dtype(dtype or x.dtype).itemsize) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def basicblock_chain(xp, ks, packed=True, interpret=False):
    """N BasicBlocks in one fwd kernel + one bwd kernel; ``ks`` is a flat
    tuple of 2N (3,3,C,C) f32 kernels (packed taps when ``packed``)."""
    return _bb_fwd_impl(xp, ks, packed, interpret)


def _bb_fwd_impl(xp, ks, packed, interpret):
    b, h, w2, c = xp.shape
    n_blocks = len(ks) // 2
    dt = xp.dtype
    bt = (_pick_bt_fwd(b, h, w2, c, c, jnp.dtype(dt).itemsize)
          or _bb_pick_bt(b, h, w2, c, n_blocks, jnp.dtype(dt).itemsize))

    def tile():
        return pl.BlockSpec((bt, h, w2, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_bb_fwd_kernel, n_blocks=n_blocks, packed=packed),
        grid=(b // bt,),
        in_specs=[tile()] + [w_spec] * (2 * n_blocks),
        out_specs=tile(),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, c), dt),
        interpret=interpret,
        **kwargs,
    )(xp, *ks)


def _bb_vjp_fwd(xp, ks, packed, interpret):
    return _bb_fwd_impl(xp, ks, packed, interpret), (xp, ks)


def _bb_vjp_bwd(packed, interpret, res, dy):
    xp, ks = res
    b, h, w2, c = xp.shape
    n_blocks = len(ks) // 2
    dt = xp.dtype
    bt = _bb_pick_bt(b, h, w2, c, n_blocks, jnp.dtype(dt).itemsize)

    def tile():
        return pl.BlockSpec((bt, h, w2, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    n_prog = b // bt

    def dk_spec():
        return pl.BlockSpec((1, 3, 3, c, c), lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(_bb_bwd_kernel, n_blocks=n_blocks, packed=packed),
        grid=(n_prog,),
        in_specs=[tile(), tile()] + [w_spec] * (2 * n_blocks),
        out_specs=(tile(),) + tuple(dk_spec()
                                    for _ in range(2 * n_blocks)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w2, c), dt),)
        + tuple(jax.ShapeDtypeStruct((n_prog, 3, 3, c, c), jnp.float32)
                for _ in range(2 * n_blocks)),
        interpret=interpret,
        **kwargs,
    )(xp, dy, *ks)
    dx = outs[0]
    dks = tuple(g.sum(axis=0).astype(k.dtype)
                for g, k in zip(outs[1:], ks))
    return dx, dks


basicblock_chain.defvjp(_bb_vjp_fwd, _bb_vjp_bwd)


def bb_chain_nhwc(x, kernel_pairs, f: int = 2, interpret: bool = False):
    """Branch chain entry: x (B,H,W,C) logical; ``kernel_pairs`` a list of
    (k1, k2) logical (3,3,C,C) f32 kernels.  ``f=2`` packs W (branch 0's
    64-ch chain -> 128 lanes, A+E taps); ``f=1`` runs unpacked (branches
    whose channels already fill lanes)."""
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_3x3,
        pack_w,
        unpack_w,
    )

    if f == 2:
        xp = pack_w(x, 2)
        return unpack_w(bb_chain_packed(xp, kernel_pairs, interpret), 2)
    ks = tuple(k for pair in kernel_pairs for k in pair)
    return basicblock_chain(x, ks, False, interpret)


def bb_chain_packed(xp, kernel_pairs, interpret: bool = False):
    """Chain entry for an ALREADY width-packed carrier (the cross-stage
    packed branch-0 contract)."""
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_3x3,
    )

    ks = tuple(pack_kernel_3x3(k, 2) for pair in kernel_pairs
               for k in pair)
    return basicblock_chain(xp, ks, True, interpret)


# ---------------------------------------------------------------------------
# chain assembly (logical <-> packed mapping outside the kernels)
# ---------------------------------------------------------------------------


def stem_layer1_chain(x, stem_params, block_params, f: int = 2,
                      interpret: bool = False):
    """x (B,H,W,Ci) compute dtype; stem_params = (k1, b1, k2, b2) logical
    f32; block_params = [(k1, k2, k3, kres|None), ...] logical f32.
    Returns the layer1 output (B,H,W,Co) in the compute dtype.

    The packers are plain jnp (differentiable); the custom_vjp kernels see
    only packed operands, so logical weight grads fall out of autodiff.
    """
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_1x1,
        pack_kernel_3x3,
        pack_w,
        unpack_w,
    )

    k1s, b1s, k2s, b2s = stem_params
    xp = pack_w(x, f)
    xp = packed_stem(
        xp,
        pack_kernel_3x3(k1s, f),
        jnp.tile(b1s, f)[None],
        pack_kernel_3x3(k2s, f),
        jnp.tile(b2s, f)[None],
        interpret,
    )
    for (k1, k2, k3, kres) in block_params:
        xp = packed_bottleneck(
            xp,
            pack_kernel_1x1(k1, f)[0, 0],
            pack_kernel_3x3(k2, f),
            pack_kernel_1x1(k3, f)[0, 0],
            pack_kernel_1x1(kres, f)[0, 0] if kres is not None else None,
            interpret,
        )
    return unpack_w(xp, f)
