"""Pallas TPU backward-warp (bilinear grid sample).

XLA lowers the per-pixel gather of ``grid_sample`` to a catastrophic TPU
gather (~1 GB/s effective at 8x512x1024x3 — 147 ms, measured), because the
TPU has no general vector-gather: Mosaic's dynamic gathers only shuffle
*within* one (8, 128) register tile.

This kernel reformulates bounded-displacement sampling as a
*roll-accumulate*: for every integer offset (dy, dx) in a
[-R, R+1]^2 window,

    out += relu(1 - |fy - (i+dy)|) * relu(1 - |fx - (j+dx)|)
           * in_range(i+dy, j+dx) * roll(x, (-dy, -dx))

The bilinear hat weights select exactly the 4 corner taps per pixel, so the
result is EXACT torch ``grid_sample(align_corners=True, padding='zeros')``
whenever every sample lands within R pixels of its output location; pixels
displaced farther produce 0 (they find no nonzero weight — callers needing
unbounded displacement use the XLA path).  Rolls are cheap register
permutes (``pltpu.roll`` supports dynamic shifts on both axes); circular
wrap is harmless because weights/validity are computed from absolute
coordinates.

Layout: channels-as-planes (B, C, H, W) inside the kernel so the lane dim
is W (a C=3 lane layout would waste 42/128 lanes on every op); the
host-side transposes are two cheap relayout passes.  Rows are tiled with a
zero-padded R halo DMA'd from HBM per program (grid = (B, H/Th)).

~20x over the XLA gather at R=8 on v5e (see tests/benchmarks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int, target: int = 64) -> int:
    for th in range(min(target, h), 0, -1):
        if h % th == 0:
            return th
    return h


def _kernel(fx_ref, fy_ref, xp_ref, out_ref, slab, sem,
            *, max_disp: int, tile_h: int, channels: int, height: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r = max_disp
    th = tile_h
    c = channels
    w = fx_ref.shape[2]
    k = 2 * r + 2
    # slab rows: the dy = r+1 tap reads slab row i + 2r + 1, so the halo
    # needs th + 2r + 1 rows — rounded up to th + 2r + 8 because DMA
    # sublane sizes must be 8-aligned.  A th + 2r slab made the LAST row
    # of every tile wrap (mod n_rows) to slab row 0 for that tap,
    # leaking image row ti*th - r into outputs with displacement
    # in (r, r+1).
    n_rows = th + 2 * r + 8

    cp = pltpu.make_async_copy(
        xp_ref.at[bi, :, pl.ds(ti * th, n_rows), :], slab, sem)
    cp.start()

    fx = fx_ref[0].astype(jnp.float32)   # (Th, W) absolute pixel x coords
    fy = fy_ref[0].astype(jnp.float32)   # absolute pixel y coords
    rows = (jax.lax.broadcasted_iota(jnp.int32, (th, w), 0)
            + ti * th).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)

    cp.wait()

    def body(t, accs):
        dy = t // k - r
        dx = t % k - r
        yy = rows + dy.astype(jnp.float32)
        xx = cols + dx.astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - yy))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - xx))
        valid = ((yy >= 0) & (yy <= height - 1) & (xx >= 0) & (xx <= w - 1))
        wgt = jnp.where(valid, wy * wx, 0.0)
        # pltpu.roll mis-handles NEGATIVE sublane shifts when the row count
        # isn't a power of two (observed on v5e) — normalize to positive.
        sy = jnp.mod(-dy, n_rows)
        sx = jnp.mod(-dx, w)
        out = []
        for ci in range(c):
            # slab rows are halo-offset by R; rolled[i] = slab[i - s] so
            # s = -dy picks row (i + R + dy)
            plane = pltpu.roll(slab[ci], shift=sy, axis=0)
            plane = pltpu.roll(plane, shift=sx, axis=1)
            out.append(accs[ci] + wgt * plane[r:r + th, :])
        return tuple(out)

    accs = jax.lax.fori_loop(
        0, k * k, body,
        tuple(jnp.zeros((th, w), jnp.float32) for _ in range(c)))
    for ci in range(c):
        out_ref[0, ci] = accs[ci].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def grid_sample_pallas(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    max_disp: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bilinear sample of NHWC ``x`` at normalized ``grid`` (B, H, W, 2).

    torch-1.x ``F.grid_sample`` semantics (align_corners=True, zero pad),
    exact for samples within ``max_disp`` pixels of their output location;
    farther samples return 0.
    """
    b, h, w, c = x.shape
    r = max_disp
    th = _pick_tile(h)

    fx = (grid[..., 0].astype(jnp.float32) + 1.0) * 0.5 * (w - 1)
    fy = (grid[..., 1].astype(jnp.float32) + 1.0) * 0.5 * (h - 1)
    # bottom pad r+8: the slab carries a th+2r+8-row halo (see _kernel)
    xp = jnp.pad(jnp.moveaxis(x, -1, 1), ((0, 0), (0, 0), (r, r + 8), (0, 0)))

    kern = functools.partial(
        _kernel, max_disp=r, tile_h=th, channels=c, height=h)
    plane = lambda: pl.BlockSpec((1, th, w), lambda bi, i: (bi, i, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[plane(), plane(), pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, c, th, w), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), x.dtype),
        scratch_shapes=[
            # input-dtype slab: the async copy requires matching element
            # types (a bf16 input into an f32 slab fails at lowering);
            # taps are promoted to f32 by the accumulate arithmetic
            pltpu.VMEM((c, th + 2 * r + 8, w), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(fx, fy, xp)
    return jnp.moveaxis(out, 1, -1)
