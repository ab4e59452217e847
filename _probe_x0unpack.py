"""Mosaic probe: reading upshead's x0 from the f2-packed HWNC producer
form (scratch, not shipped).

The r2c trace showed a 3.1 ms relayout copy (copy.527) between the
stage-3 branch-0 producer and upshead's x0 BlockSpec.  Killing it means
the kernel must consume x0 in the producer's own form — logical
(H, W/2, B, 2*C0) row-major — and recover per-PIXEL rows for the K=64
contraction in-VMEM.  Two candidate lowerings, both probed here because
CPU interpret mode cannot establish Mosaic legality:

1. UNPACK64: load -> lane-unpack reshape (r, c, 128) -> (r, 2c, 64) ->
   dot.  Expected to ABORT: pallas_fuse0 hit "unsupported shape cast"
   for exactly this target-lanes-64 pattern (ops notes / memory:
   lane reshapes to <128 target lanes fail even mid-computation).
2. TWO-DOT INTERLEAVE: dot the packed tile against phase-masked weight
   stacks [[W],[0]] and [[0],[W]] (padded-FLOP cost identical to the
   current K=64->128 padded dot), lane-concat the two (r, c, N) results
   and unpack-reshape (r, c, 2N) -> (r, 2c, N) with N a 128-multiple —
   the form pallas_upshead already uses legally for up1/up2.  The
   reshape output feeds an ADD (accumulator), not a dot, so this also
   probes that adjacency.

Each probe checks numerics against the unpacked XLA reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _mk(r=8, c=16, c0=64, n=256, dt=jnp.bfloat16, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    xp = jax.random.normal(k1, (r, c, 2 * c0), dt)      # f2-packed rows
    w = jax.random.normal(k2, (c0, n), dt)
    # reference: unpack (r, c, 2c0) -> (r, 2c, c0) then matmul
    x = jnp.reshape(xp, (r, 2 * c, c0))
    ref = jnp.einsum("rpc,cn->rpn", x.astype(jnp.float32),
                     w.astype(jnp.float32))
    return xp, w, ref


def probe_unpack64():
    xp, w, ref = _mk()
    r, c, _ = xp.shape
    c0, n = w.shape

    def kern(x_ref, w_ref, o_ref):
        x = jnp.reshape(x_ref[...], (r, 2 * c, c0))      # target lanes 64
        o_ref[...] = jax.lax.dot_general(
            x, w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((r, 2 * c, n), jnp.float32),
        )(xp, w)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"UNPACK64: compiled, maxerr={err:.4f} "
              f"correct={err < 0.2}")
    except Exception as e:
        print("UNPACK64: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])


def probe_twodot_interleave():
    xp, w, ref = _mk()
    r, c, _ = xp.shape
    c0, n = w.shape
    zeros = jnp.zeros_like(w)
    w_even = jnp.concatenate([w, zeros], axis=0)         # (128, n)
    w_odd = jnp.concatenate([zeros, w], axis=0)

    def kern(x_ref, we_ref, wo_ref, o_ref):
        dn = (((2,), (0,)), ((), ()))
        xv = x_ref[...]
        h_even = jax.lax.dot_general(xv, we_ref[...], dn,
                                     preferred_element_type=jnp.float32)
        h_odd = jax.lax.dot_general(xv, wo_ref[...], dn,
                                    preferred_element_type=jnp.float32)
        both = jnp.concatenate([h_even, h_odd], axis=-1)  # (r, c, 2n)
        up = jnp.reshape(both, (r, 2 * c, n))    # target lanes n>=128
        # in the real kernel the unpacked result feeds the tap ACCUMULATOR,
        # not a store — probe that adjacency (reshape -> add -> store),
        # not the store-fused one pallas_fuse0 already proved illegal.
        # (+1.0 is a REAL add that cannot fold away; ref compensates)
        o_ref[...] = up + jnp.float32(1.0)

    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((r, 2 * c, n), jnp.float32),
        )(xp, w_even, w_odd)
        err = float(jnp.max(jnp.abs(out - (ref + 1.0))))
        print(f"TWODOT_INTERLEAVE: compiled, maxerr={err:.4f} "
              f"correct={err < 0.2}")
    except Exception as e:
        print("TWODOT_INTERLEAVE: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])


def probe_hwnc_blockspec():
    """The real read path: 4-D HWNC array, per-(batch,row-tile) blocks."""
    H, W2, B, C = 32, 16, 2, 128
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (H, W2, B, C), jnp.bfloat16)
    th = 8

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        out = pl.pallas_call(
            kern,
            grid=(B, H // th),
            in_specs=[pl.BlockSpec((th, W2, 1, C),
                                   lambda bi, i: (i, 0, bi, 0))],
            out_specs=pl.BlockSpec((th, W2, 1, C),
                                   lambda bi, i: (i, 0, bi, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W2, B, C), jnp.bfloat16),
        )(x)
        ok = bool(jnp.all(out == x * 2.0))
        print(f"HWNC_BLOCKSPEC: compiled, correct={ok}")
    except Exception as e:
        print("HWNC_BLOCKSPEC: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])


if __name__ == "__main__":
    probe_unpack64()
    probe_twodot_interleave()
    probe_hwnc_blockspec()
    probe_fourdot_f4()
    probe_f4_blockspec()


def probe_fourdot_f4():
    """The f4 consumer lowering: load a (r, c, 4C0) f4-packed block, lane-
    slice the two 128-lane halves, dot each against the phase-masked
    stacks, 4-way lane-concat, unpack-reshape (r, c, 4n) -> (r, 4c, n).
    Zero producer cost: fused_out0 already writes this f4 form."""
    r, c, c0, n = 8, 16, 64, 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    xq = jax.random.normal(k1, (r, c, 4 * c0), jnp.bfloat16)
    w = jax.random.normal(k2, (c0, n), jnp.bfloat16)
    x = jnp.reshape(xq, (r, 4 * c, c0))
    ref = jnp.einsum("rpc,cn->rpn", x.astype(jnp.float32),
                     w.astype(jnp.float32)) + 1.0
    zeros = jnp.zeros_like(w)
    we = jnp.concatenate([w, zeros], axis=0)          # (128, n)
    wo = jnp.concatenate([zeros, w], axis=0)

    def kern(x_ref, we_ref, wo_ref, o_ref):
        dn = (((2,), (0,)), ((), ()))
        xv = x_ref[...]
        lo, hi = xv[:, :, :2 * c0], xv[:, :, 2 * c0:]
        hs = [jax.lax.dot_general(part, wref[...], dn,
                                  preferred_element_type=jnp.float32)
              for part in (lo, hi) for wref in (we_ref, wo_ref)]
        both = jnp.concatenate([hs[0], hs[1], hs[2], hs[3]], axis=-1)
        up = jnp.reshape(both, (r, 4 * c, n))
        o_ref[...] = up + jnp.float32(1.0)

    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((r, 4 * c, n), jnp.float32),
        )(xq, we, wo)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"FOURDOT_F4: compiled, maxerr={err:.4f} correct={err < 0.5}")
    except Exception as e:
        print("FOURDOT_F4: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])


def probe_f4_blockspec():
    """Consumer-side geometry: 4-D NHWC f4 array, (1, th, wt, 256) blocks
    (same shape class as the shipping x0 BlockSpec, lanes 256)."""
    B, H, W4, C = 2, 32, 32, 256
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W4, C), jnp.bfloat16)
    th, wt = 8, 16

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        out = pl.pallas_call(
            kern,
            grid=(B, H // th, W4 // wt),
            in_specs=[pl.BlockSpec((1, th, wt, C),
                                   lambda bi, i, j: (bi, i, j, 0))],
            out_specs=pl.BlockSpec((1, th, wt, C),
                                   lambda bi, i, j: (bi, i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W4, C), jnp.bfloat16),
        )(x)
        ok = bool(jnp.all(out == x * 2.0))
        print(f"F4_BLOCKSPEC: compiled, correct={ok}")
    except Exception as e:
        print("F4_BLOCKSPEC: FAILED", type(e).__name__,
              str(e).split(chr(10))[0][:160])
