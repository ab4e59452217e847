"""Fused window-correlation attention — Pallas TPU kernel.

The stage-3 attention (reference nets/refine_nets.py:253-323) is, per
pixel: cosine-similarity of a query feature against every offset in a
(win_h x win_w) window of two neighbor feature maps, softmax over all
2*win_h*win_w logits, then a probability-weighted sum of the (shifted)
neighbor value features.  Composed in XLA this materializes a
(B, H, W, 2K) similarity tensor in HBM between the correlation, softmax,
and aggregation stages (K = 45 at V1's default 5x9 window).

Kernel design (one pass, flash-attention style):
- grid (B, H/Th): each program owns a row tile of the output;
- keys/values are pre-padded in XLA and stay in HBM (``pltpu.ANY``); the
  kernel DMAs each tile's (Th + 2*pad_h)-row halo slab into VMEM scratch —
  the only way to get overlapping blocks, which BlockSpecs can't express;
- a ``fori_loop`` over the 2K static window offsets does
  slice -> dot -> online-softmax update -> weighted accumulate, so the
  live set stays at one offset's temporaries instead of 2K unrolled copies
  (the unrolled version stacked ~100MB of scoped VMEM);
- zero padding makes out-of-bounds offsets contribute sim = 0, exactly the
  reference's zero-pad unfold semantics and the XLA fallback's;
- per-neighbor argmax offsets (the reference's flow map,
  refine_nets.py:273-279) fall out of the same pass for free.

Nothing but the inputs and the (B, H, W, Cv) output ever touches HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_video_interpolation_extrapolation_tpu.ops.corr import _offsets

_NEG_INF = -1e30


def _pick_tile(h: int, target: int = 8) -> int:
    for th in range(min(target, h), 0, -1):
        if h % th == 0:
            return th
    return h


def _kernel(q_ref, k1_ref, k2_ref, v1_ref, v2_ref, out_ref, flow_ref,
            k_sc, v_sc, sems,
            *, win_h: int, win_w: int, tile_h: int, eps: float = 1e-12):
    """q_ref: (1, Th, W, C) VMEM block; k/v refs: FULL (B, H+2ph, W+2pw,
    C|Cv) arrays in HBM (ANY space requires whole-array blocks); scratch
    k_sc (2, Th+2ph, W+2pw, C), v_sc (2, Th+2ph, W+2pw, Cv)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    th = tile_h
    w = q_ref.shape[2]
    c = q_ref.shape[3]
    cv = v_sc.shape[3]
    ph, pw = win_h // 2, win_w // 2
    kk = win_h * win_w
    row0 = i * th  # halo slab start in the padded array

    copies = []
    for n, (src, dst) in enumerate(((k1_ref, k_sc), (k2_ref, k_sc))):
        copies.append(pltpu.make_async_copy(
            src.at[bi, pl.ds(row0, th + 2 * ph)], dst.at[n], sems.at[n]))
    for n, src in enumerate((v1_ref, v2_ref)):
        copies.append(pltpu.make_async_copy(
            src.at[bi, pl.ds(row0, th + 2 * ph)], v_sc.at[n], sems.at[2 + n]))
    for cp in copies:
        cp.start()

    def norm(x):
        ss = jnp.sum(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(jnp.maximum(ss, eps * eps))

    q = norm(q_ref[0].astype(jnp.float32))  # (Th, W, C)

    for cp in copies:
        cp.wait()
    # normalize keys once in scratch (padding rows/cols normalize to 0)
    k_sc[0] = norm(k_sc[0].astype(jnp.float32)).astype(k_sc.dtype)
    k_sc[1] = norm(k_sc[1].astype(jnp.float32)).astype(k_sc.dtype)

    init = (
        jnp.full((th, w, 1), _NEG_INF, jnp.float32),   # m
        jnp.zeros((th, w, 1), jnp.float32),            # l
        jnp.zeros((th, w, cv), jnp.float32),           # acc
        jnp.full((th, w, 1), _NEG_INF, jnp.float32),   # best sim, neighbor 0
        jnp.full((th, w, 1), _NEG_INF, jnp.float32),   # best sim, neighbor 1
        jnp.zeros((th, w, 2), jnp.float32),            # flow n0 (dx, dy)
        jnp.zeros((th, w, 2), jnp.float32),            # flow n1 (dx, dy)
    )

    def body(t, carry):
        # dynamic start only along n (untiled) and rows (dim 1); the W-dim
        # window offset is unrolled statically — Mosaic cannot slice tiled
        # dims at dynamic offsets.
        n = t // win_h
        wy = t % win_h
        k_slab = k_sc[pl.ds(n, 1), pl.ds(wy, th), :, :][0].astype(jnp.float32)
        v_slab = v_sc[pl.ds(n, 1), pl.ds(wy, th), :, :][0].astype(jnp.float32)
        dy_f = (wy - ph).astype(jnp.float32)

        m, l, acc, b0, b1, f0, f1 = carry
        for wx in range(win_w):
            k_sh = jax.lax.slice(k_slab, (0, wx, 0), (th, wx + w, c))
            v_sh = jax.lax.slice(v_slab, (0, wx, 0), (th, wx + w, cv))
            s = jnp.sum(q * k_sh, axis=-1, keepdims=True)

            dxdy = jnp.concatenate(
                [jnp.full((th, w, 1), float(wx - pw), jnp.float32),
                 jnp.full((th, w, 1), 1.0, jnp.float32) * dy_f], axis=-1)
            is0 = (s > b0) & (n == 0)
            is1 = (s > b1) & (n == 1)
            b0 = jnp.where(is0, s, b0)
            b1 = jnp.where(is1, s, b1)
            f0 = jnp.where(is0, dxdy, f0)
            f1 = jnp.where(is1, dxdy, f1)

            m_new = jnp.maximum(m, s)
            scale = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            acc = acc * scale + p * v_sh
            l = l * scale + p
            m = m_new
        return m, l, acc, b0, b1, f0, f1

    m, l, acc, b0, b1, f0, f1 = jax.lax.fori_loop(0, 2 * win_h, body, init)
    out_ref[0] = (acc / jnp.maximum(l, eps)).astype(out_ref.dtype)
    flow_ref[0] = jnp.concatenate([f0, f1], axis=-1).astype(flow_ref.dtype)


def fits_vmem(h: int, w: int, c: int, cv: int,
              budget_bytes: int = int(15.5 * 2 ** 20),
              win_h: int = 5, win_w: int = 9) -> bool:
    """Kernel-feasibility guard.

    - channel dims must be lane-aligned (Mosaic slices tiled memrefs only at
      multiples of 128);
    - per-tile VMEM: halo slabs + q/out blocks + the win_w statically
      unrolled slice temporaries Mosaic stack-allocates.
    """
    if c % 128 != 0 or cv % 128 != 0:
        return False
    th = _pick_tile(h)
    ph, pw = win_h // 2, win_w // 2
    slab = (th + 2 * ph) * (w + 2 * pw) * (2 * c + 2 * cv) * 4
    blocks = th * w * (c + cv + 4) * 4
    unrolled = win_w * th * w * (c + cv) * 4
    carry = th * w * (cv + 8) * 4 * 2
    return slab + blocks + unrolled + carry < budget_bytes


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "interpret"))
def fused_window_attention(
    q: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    win_h: int = 5,
    win_w: int = 9,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """softmax-weighted neighbor aggregation + argmax flow, fully fused.

    Args: q/k1/k2 (B,H,W,C), v1/v2 (B,H,W,Cv).
    Returns: (out (B,H,W,Cv), flow (B,H,W,4) = (dx1,dy1,dx2,dy2)).

    Numerically equals softmax(window_correlation(q, [k1, k2])) aggregated
    by window_aggregate([v1, v2], .) — identical zero-pad border semantics
    to the reference's unfold and the XLA fallback.
    """
    b, h, w, c = q.shape
    cv = v1.shape[-1]
    ph, pw = win_h // 2, win_w // 2
    th = _pick_tile(h)

    pad = ((0, 0), (ph, ph), (pw, pw), (0, 0))
    k1p, k2p = jnp.pad(k1, pad), jnp.pad(k2, pad)
    v1p, v2p = jnp.pad(v1, pad), jnp.pad(v2, pad)

    kern = functools.partial(_kernel, win_h=win_h, win_w=win_w, tile_h=th)
    q_spec = pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    hbm = lambda ch: pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((1, th, w, cv), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    flow_spec = pl.BlockSpec((1, th, w, 4), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out, flow = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[q_spec, hbm(c), hbm(c), hbm(cv), hbm(cv)],
        out_specs=(out_spec, flow_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cv), q.dtype),
            jax.ShapeDtypeStruct((b, h, w, 4), jnp.float32),
        ),
        scratch_shapes=[
            # input-dtype slabs: the halo DMAs require matching element
            # types (bf16 inputs into f32 slabs fail at lowering); the
            # kernel normalizes/casts to f32 at use (lines 85, 104-105)
            pltpu.VMEM((2, th + 2 * ph, w + 2 * pw, c), k1p.dtype),
            pltpu.VMEM((2, th + 2 * ph, w + 2 * pw, cv), v1p.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(q, k1p, k2p, v1p, v2p)
    return out, flow


def fused_window_attention_reference(
    q, k1, k2, v1, v2, win_h: int = 5, win_w: int = 9
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA composition of the same math — the numerical oracle for kernel
    tests and the fallback for shapes that don't fit VMEM."""
    from deep_video_interpolation_extrapolation_tpu.ops.corr import (
        argmax_flow,
        window_aggregate,
        window_correlation,
    )
    sim = window_correlation(q, [k1, k2], win_h, win_w)
    prob = jax.nn.softmax(sim, axis=-1)
    out = window_aggregate([v1, v2], prob, win_h, win_w)
    fl = argmax_flow(sim, 2, win_h, win_w)  # (B, 2, H, W, 2) (dx, dy)
    flow = jnp.concatenate([fl[:, 0], fl[:, 1]], axis=-1)
    return out.astype(q.dtype), flow
