"""Taps-in-N decomposition of small-Cout 3x3 convs.

The MXU pads a matmul's N (output-channel) dimension to 128 lanes, so a
3x3 conv with a tiny Cout (the HRNet rgb/seg heads: 448->3 and 448->20,
reference nets/HRNet.py:410-442) is pad-bound: it costs
``2*M*(9*Cin)*128`` padded FLOPs no matter how small Cout is.

This op computes the same conv as

  1. ONE 1x1 conv whose output stacks all 9 taps in the channel dim
     (N = 9*Cout, so e.g. the seg head's padded cost drops from
     ``9*Cin x 128`` to ``Cin x 256`` — a 4.7x padded-FLOP reduction), then
  2. a 9-way shifted add over a (B, H, W, 9, Cout) view — pure VPU/bandwidth
     work that XLA fuses into one pass.

Measured on v5e at the HRNet head shape (8x512x1024x448, bf16): the full
dual-head region (1x1 -> lrelu -> 3x3, both heads) drops from 84 ms to
47 ms.  Exact math (identity up to float addition order): the correctness
test pins it against ``lax.conv_general_dilated`` directly.

Only stride-1, dilation-1, SAME-padded (pad=1) 3x3 convs are supported —
exactly the head-conv shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv3x3_tapped(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv via taps-in-N + shifted add.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout) HWIO; b: (Cout,) or None.
    Returns (B, H, W, Cout), numerically equal to the direct conv.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "taps-in-N path is for 3x3 kernels"
    B, H, W, _ = x.shape
    # wt column block t = ky*3+kx holds w[ky, kx]  -> (1, 1, Cin, 9*Cout)
    wt = jnp.transpose(w.reshape(kh * kw, cin, cout), (1, 0, 2)).reshape(
        1, 1, cin, kh * kw * cout)
    yt = jax.lax.conv_general_dilated(
        x, wt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(B, H, W, kh * kw, cout)
    # out[y, x] = sum_t yt[y + ky - 1, x + kx - 1, t]  (zero-padded edges,
    # matching the conv's SAME zero padding).  Slicing over the tap axis
    # keeps every slice channel-aligned (lane offsets of 0) — slicing the
    # flat 9*Cout axis at Cout-multiples costs lane relayouts instead.
    ytp = jnp.pad(yt, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for ky in range(kh):
        for kx in range(kw):
            t = ky * kw + kx
            sl = jax.lax.slice(
                ytp, (0, ky, kx, t, 0),
                (B, ky + H, kx + W, t + 1, cout))[..., 0, :]
            out = sl if out is None else out + sl
    if b is not None:
        out = out + b
    return out


def dual_conv3x3_tapped(
    h: jnp.ndarray,
    w_rgb: jnp.ndarray, b_rgb: Optional[jnp.ndarray],
    w_seg: jnp.ndarray, b_seg: Optional[jnp.ndarray],
):
    """Both HRNet head 3x3s over the lane-concat hidden state, taps-in-N.

    ``h`` (B, H, W, 2*Cin) stacks the two heads' post-1x1 activations
    (lanes [0:Cin] = rgb head, [Cin:2Cin] = seg head — the layout the
    fused upsample+1x1 kernel writes, ops/pallas_upshead.py).  Computes
    rgb = conv3x3(h[..., :Cin], w_rgb), seg = conv3x3(h[..., Cin:], w_seg)
    WITHOUT slicing h: lane-slicing a (B, H, W, 896) tensor before a conv
    materializes two full-size copies (+7.5 GB of HBM traffic at
    8x512x1024 bf16) because TPU convs read materialized operands.  The
    single taps matmul uses a (2Cin, 9*(Cr+Cs)) block kernel (rgb rows ->
    rgb columns, seg rows -> seg columns), then one 9-way shifted add over
    the (.., 9, Cr+Cs) view covers both heads at once.

    Returns (rgb (B,H,W,Cr), seg (B,H,W,Cs)).
    """
    cr = w_rgb.shape[-1]
    wt = build_dual_tap_kernel(w_rgb, w_seg, h.dtype)
    cin2 = wt.shape[0]
    assert h.shape[-1] == cin2
    co = wt.shape[-1] // 9
    yt = jax.lax.conv_general_dilated(
        h, wt.reshape(1, 1, cin2, 9 * co), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype)
    out = taps_shifted_add(yt, co)
    bias = jnp.concatenate([
        (b_rgb if b_rgb is not None else jnp.zeros((cr,))),
        (b_seg if b_seg is not None else jnp.zeros((co - cr,))),
    ]).astype(h.dtype)
    out = out + bias
    return out[..., :cr], out[..., cr:]


def build_dual_tap_kernel(w_rgb: jnp.ndarray, w_seg: jnp.ndarray, dtype):
    """(2Cin, 9*(Cr+Cs)) block taps-in-N matrix for both heads' 3x3s.

    Rows [0:Cin] (the rgb half of the fused hidden state) feed each tap's
    rgb columns, rows [Cin:2Cin] the seg columns; tap t's block is
    columns [t*(Cr+Cs), (t+1)*(Cr+Cs)).
    """
    kh, kw, cin, cr = w_rgb.shape
    _, _, cin2, cs = w_seg.shape
    assert kh == 3 and kw == 3 and cin == cin2
    co = cr + cs
    wr9 = jnp.transpose(w_rgb.reshape(9, cin, cr), (1, 0, 2))  # (Cin, 9, Cr)
    ws9 = jnp.transpose(w_seg.reshape(9, cin, cs), (1, 0, 2))
    wt = jnp.zeros((2 * cin, 9, co), dtype)
    wt = wt.at[:cin, :, :cr].set(wr9.astype(dtype))
    wt = wt.at[cin:, :, cr:].set(ws9.astype(dtype))
    return wt.reshape(2 * cin, 9 * co)


def taps_shifted_add(yt: jnp.ndarray, co: int) -> jnp.ndarray:
    """9-way shifted add over a (B, H, W, 9*co) taps-in-N tensor.

    out[y, x] = sum_t yt[y + ky - 1, x + kx - 1, t] with zero-padded edges
    (the conv's SAME zero padding); pure VPU/bandwidth work XLA fuses.
    Slicing over the tap axis of the (B, H, W, 9, co) view keeps every
    slice channel-aligned; the alternative — slicing the flat 9*co lane
    axis at co-multiples — was A/B'd and is ~10 ms/step SLOWER in-model
    at co=23 (per-slice lane relayouts), despite the 5-D view costing a
    5.9 ms layout copy of the kernel output for its (16, 128) retiling.
    """
    B, H, W, n = yt.shape
    assert n == 9 * co, (n, co)
    yt = yt.reshape(B, H, W, 9, co)
    ytp = jnp.pad(yt, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            sl = jax.lax.slice(
                ytp, (0, ky, kx, t, 0),
                (B, ky + H, kx + W, t + 1, co))[..., 0, :]
            out = sl if out is None else out + sl
    return out
