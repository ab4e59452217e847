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
