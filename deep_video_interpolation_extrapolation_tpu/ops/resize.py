"""Bilinear/nearest resize with PyTorch-compatible coordinate conventions.

The reference mixes two bilinear conventions:

- ``align_corners=True`` — explicit in SRN-style refiners and losses
  (reference nets/refine_nets.py:110-112, runners/InterTrainer.py:418-419);
- ``align_corners=False`` (the torch default) — HRNet fuse layers / output
  upsampling (reference nets/HRNet.py:219-222,577-580).

``jax.image.resize(method="bilinear")`` implements the half-pixel-center
convention, which is exactly ``align_corners=False``; the ``True`` variant is
implemented here as two separable 1-D weighted gathers (XLA lowers these to
efficient TPU gathers, and the separable form keeps the arithmetic on the
VPU instead of scalar code).

All tensors are NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def _resize_axis_align_corners(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """1-D bilinear resize along ``axis`` with align_corners=True."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1:
        return jnp.take(x, jnp.array([0]), axis=axis)
    scale = (in_size - 1) / (out_size - 1)
    coords = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = coords - lo.astype(jnp.float32)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape).astype(x.dtype)
    return x_lo * (1 - frac) + x_hi * frac


def upsample2x_convt(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (align_corners=False) as a depthwise
    transposed conv: lhs_dilation=2 with the separable [1,3,3,1]/4 kernel on
    an edge-padded input reproduces torch's half-pixel weights (0.25/0.75)
    and clamped borders bit-for-bit (delta-response verified).

    Measured ~1.7x faster than ``jax.image.resize`` on v5e at HRNet's
    shapes (the resize lowers to gathers/einsums; this rides the conv
    units).  NOTE: TPU f32 convs multiply in bf16 internally, so this is
    only wired up for bf16 inputs (where both paths round identically).
    """
    b, h, w, c = x.shape
    k = jnp.array([1.0, 3.0, 3.0, 1.0], x.dtype) / 4.0
    kern = (k[:, None] * k[None, :])[:, :, None, None] * jnp.ones(
        (1, 1, 1, c), x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=x.dtype)
    return y[:, 1:1 + 2 * h, 1:1 + 2 * w]


def upsample4x_convt(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 4x bilinear upsample (align_corners=False) as a depthwise
    transposed conv, like :func:`upsample2x_convt` but stride 4 with the
    separable [1,3,5,7,7,5,3,1]/8 kernel (out o <- in o/4 - 0.375: phase
    weight pairs (3,5)/8, (1,7)/8, (7,1)/8, (5,3)/8); edge-padding
    reproduces the clamped borders.  bf16 only (see upsample2x_convt).
    """
    b, h, w, c = x.shape
    k = jnp.array([1.0, 3.0, 5.0, 7.0, 7.0, 5.0, 3.0, 1.0], x.dtype) / 8.0
    kern = (k[:, None] * k[None, :])[:, :, None, None] * jnp.ones(
        (1, 1, 1, c), x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), ((7, 7), (7, 7)), lhs_dilation=(4, 4),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=x.dtype)
    return y[:, 6:6 + 4 * h, 6:6 + 4 * w]


def _shift_edge(x, axis, d):
    """x shifted by d (+1: value from index-1) along axis, edge-clamped."""
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim
    ed = [slice(None)] * x.ndim
    if d == 1:
        sl[axis] = slice(0, n - 1)
        ed[axis] = slice(0, 1)
        return jnp.concatenate([x[tuple(ed)], x[tuple(sl)]], axis)
    sl[axis] = slice(1, n)
    ed[axis] = slice(n - 1, n)
    return jnp.concatenate([x[tuple(sl)], x[tuple(ed)]], axis)


def _upsample_axis_lane(x, axis, phases):
    """Exact 2^k x bilinear upsample along `axis` via phase-major lane
    packing: each output phase is an elementwise blend of whole tensors,
    lane-concat + free logical reshape interleaves them.  No dot_generals
    (the jax.image.resize lowering needs full-tensor layout copies around
    its transposed dots) and no depthwise convs (which waste the MXU).
    `phases`: list of (shift, w_lo, w_hi); out phase p = w_lo*x[shift(i)]
    + w_hi*x[...]."""
    parts = []
    for d, w_lo, w_hi in phases:
        if d == 0:
            lo = x
            hi = _shift_edge(x, axis, -1)
        else:
            lo = _shift_edge(x, axis, 1)
            hi = x
        p = (w_lo * lo.astype(jnp.float32)
             + w_hi * hi.astype(jnp.float32)).astype(x.dtype)
        parts.append(p)
    f = len(parts)
    if axis == x.ndim - 2:  # W: pack phases into lanes, unpack to width
        cat = jnp.concatenate(parts, axis=-1)
        b, h, w, c = x.shape
        return cat.reshape(b, h, f * w, c)
    # H: stack a new minor-of-H axis and merge
    cat = jnp.stack(parts, axis=axis + 1)
    sh = list(x.shape)
    sh[axis] *= f
    return cat.reshape(sh)


def upsample2x_to_packed(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample emitting the width-packed f=2 layout:
    (B, Hs, Ws, C) -> (B, 2Hs, Ws, 2C) with lanes [even-col C | odd-col C].

    Elementwise-only: H phases stack along a new minor-of-H axis (merging
    it is a free reshape — the tiled minor dims are untouched), W phases
    lane-concat WITHOUT the interleave that makes unpacked elementwise
    upsampling expensive.  Feeds packed fuse-sums in HighResolutionModule
    so branch-0 never leaves the packed layout between stages.
    """
    b, hs, ws, c = x.shape
    xf = x.astype(jnp.float32)
    rm1 = _shift_edge(xf, 1, 1)
    rp1 = _shift_edge(xf, 1, -1)
    r0 = 0.25 * rm1 + 0.75 * xf
    r1 = 0.75 * xf + 0.25 * rp1
    hh = jnp.stack([r0, r1], axis=2).reshape(b, 2 * hs, ws, c)
    cm1 = _shift_edge(hh, 2, 1)
    cp1 = _shift_edge(hh, 2, -1)
    return jnp.concatenate(
        [0.25 * cm1 + 0.75 * hh, 0.75 * hh + 0.25 * cp1], axis=-1
    ).astype(x.dtype)


_PHASES_2X = ((1, 0.25, 0.75), (0, 0.75, 0.25))
_PHASES_4X = ((1, 0.375, 0.625), (1, 0.125, 0.875),
              (0, 0.875, 0.125), (0, 0.625, 0.375))


def upsample2x_lane(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (align_corners=False), elementwise-only."""
    return _upsample_axis_lane(
        _upsample_axis_lane(x, 1, _PHASES_2X), 2, _PHASES_2X)


def upsample4x_lane(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 4x bilinear upsample (align_corners=False), elementwise-only."""
    return _upsample_axis_lane(
        _upsample_axis_lane(x, 1, _PHASES_4X), 2, _PHASES_4X)


def interpolate_bilinear(
    x: jnp.ndarray,
    size: Optional[Tuple[int, int]] = None,
    scale_factor: Optional[Union[float, Tuple[float, float]]] = None,
    align_corners: bool = False,
) -> jnp.ndarray:
    """NHWC bilinear resize matching ``torch.nn.functional.interpolate``."""
    assert x.ndim == 4, x.shape
    if size is None:
        assert scale_factor is not None
        if not isinstance(scale_factor, (tuple, list)):
            scale_factor = (scale_factor, scale_factor)
        size = (
            int(x.shape[1] * scale_factor[0]),
            int(x.shape[2] * scale_factor[1]),
        )
    h, w = size
    if (h, w) == x.shape[1:3]:
        return x
    if align_corners:
        out = _resize_axis_align_corners(x, 1, h)
        out = _resize_axis_align_corners(out, 2, w)
        return out
    # NOTE: routing exact-2x bf16 upsamples through upsample2x_convt was
    # A/B'd at the full-model level and REGRESSED the bench (22.54 -> 22.03
    # fps) despite being 1.7x faster in isolation — the resize einsum fuses
    # better with its consumers in the HRNet graph.  Kept unwired.
    # antialias=False: torch F.interpolate(bilinear) never low-pass filters,
    # even when downsampling — match it exactly.
    return jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="bilinear", antialias=False
    ).astype(x.dtype)


def interpolate_nearest(
    x: jnp.ndarray,
    size: Optional[Tuple[int, int]] = None,
    scale_factor: Optional[float] = None,
) -> jnp.ndarray:
    assert x.ndim == 4, x.shape
    if size is None:
        size = (int(x.shape[1] * scale_factor), int(x.shape[2] * scale_factor))
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[3]), method="nearest"
    )


def avg_pool(
    x: jnp.ndarray,
    window: Tuple[int, int],
    stride: Optional[Tuple[int, int]] = None,
    padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
    count_include_pad: bool = True,
) -> jnp.ndarray:
    """NHWC average pool (torch ``F.avg_pool2d`` semantics)."""
    stride = stride or window
    dims = (1, window[0], window[1], 1)
    strides = (1, stride[0], stride[1], 1)
    if isinstance(padding, str):
        pads = padding
    else:
        pads = ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    if count_include_pad:
        return summed / (window[0] * window[1])
    # the ones-pool divisor handles string paddings ('SAME') too — the old
    # isinstance short-circuit silently include-pad'ed them
    ones = jnp.ones(x.shape[:3] + (1,), dtype=x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return summed / counts


def max_pool(
    x: jnp.ndarray,
    window: Tuple[int, int],
    stride: Optional[Tuple[int, int]] = None,
    padding: Union[str, Sequence[Tuple[int, int]]] = "VALID",
) -> jnp.ndarray:
    stride = stride or window
    dims = (1, window[0], window[1], 1)
    strides = (1, stride[0], stride[1], 1)
    if isinstance(padding, str):
        pads = padding
    else:
        pads = ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
    init = jnp.array(-jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(x, init, jax.lax.max, dims, strides, pads)
