"""Width-packed 3x3 convolution — exact MXU-lane optimization.

Problem: HRNet's full-resolution branch runs 3x3 convs with 64 channels.
The v5e MXU consumes 128-wide lanes, so 64-in/64-out convs run at ~33% of
peak (measured; see README benchmark notes).

Transform: fold width-parity into channels.  ``(B, H, W, C) ->
(B, H, W/2, 2C)`` is a *bitwise-identity reshape* (the last two dims are
contiguous), and a stride-1 SAME 3x3 conv becomes a 3x3 conv on the packed
layout with a structured (3, 3, 2C, 2O) kernel built from the logical
(3, 3, C, O) params:

  out phase 0 at packed col j reads cols {2j-1, 2j, 2j+1}
      = (j-1, phase1) @ kx0 | (j, phase0) @ kx1 | (j, phase1) @ kx2
  out phase 1 reads {2j, 2j+1, 2j+2}
      = (j, phase0) @ kx0 | (j, phase1) @ kx1 | (j+1, phase0) @ kx2

so each (in-phase, out-phase, packed-tap) slot holds one logical tap and
half the slots are zero: 2x the nominal FLOPs, but on 128-lane operands the
MXU runs ~2.8x faster per FLOP, a measured ~1.4-2x net win at HRNet's
shapes.  SAME padding on the packed width is exactly the logical 1-pixel
zero pad (the extra phantom pixel at each edge only meets zero weights).

The module-level ``PackedConv`` keeps its *parameters in the logical
(3, 3, C, O) layout*, so checkpoints interchange freely with plain Conv.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def pack_w(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/f, f*C); bitwise identity in logical order."""
    b, h, w, c = x.shape
    assert w % factor == 0, (w, factor)
    return x.reshape(b, h, w // factor, factor * c)


def unpack_w(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, Wf, f*C) -> (B, H, f*Wf, C); bitwise identity."""
    b, h, wf, cf = x.shape
    return x.reshape(b, h, wf * factor, cf // factor)


def pack_kernel_3x3(k: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(3, 3, C, O) logical -> (3, 3, f*C, f*O) packed with structured zeros.

    Packed tap KX and phases (a_i in, a_o out) carry the logical horizontal
    tap dx = f*(KX-1) + a_i - a_o when |dx| <= 1, else zero: output pixel
    f*j + a_o reads absolute column f*(j + KX - 1) + a_i.
    """
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3, (kh, kw)
    f = factor
    z = jnp.zeros((3, c, o), k.dtype)
    taps = []
    for kx in range(3):
        rows = []
        for a_i in range(f):
            cols = []
            for a_o in range(f):
                dx = f * (kx - 1) + a_i - a_o
                cols.append(k[:, dx + 1] if -1 <= dx <= 1 else z)
            rows.append(jnp.concatenate(cols, axis=-1))     # (3, C, f*O)
        taps.append(jnp.concatenate(rows, axis=-2))         # (3, f*C, f*O)
    return jnp.stack(taps, axis=1)                          # (3, 3, f*C, f*O)


def pack_kernel_1x1(k: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(1, 1, C, O) logical -> (1, 1, f*C, f*O) block-diagonal.

    A 1x1 conv acts per-pixel, so in the width-packed layout each phase's
    channels map independently through the same logical kernel: the packed
    kernel is block-diagonal (phase-mixing blocks are zero).  2x nominal
    FLOPs on <=64-channel operands, but full 128 MXU lanes.
    """
    kh, kw, c, o = k.shape
    assert kh == 1 and kw == 1, (kh, kw)
    f = factor
    z = jnp.zeros((c, o), k.dtype)
    rows = []
    for a_i in range(f):
        rows.append(jnp.concatenate(
            [k[0, 0] if a_i == a_o else z for a_o in range(f)], axis=-1))
    return jnp.concatenate(rows, axis=-2)[None, None]


def ae_kernels_3x3(k: jnp.ndarray, factor: int = 2):
    """Split a logical 3x3 kernel into the A+E packed decomposition.

    The single packed kernel from :func:`pack_kernel_3x3` spends
    3kx*3ky*(fC)*(fO) MACs per packed cell with at least half the slots
    structurally zero (2x logical FLOPs at f=2, 4x at f=4).  Observation:
    an output pixel's horizontal taps split into
    - **A** (same-cell): taps whose source pixel lies in the SAME packed
      cell, i.e. in-phase a_i = a_o + dx with |a_i - a_o| <= 1 — a
      block-tridiagonal (fC, fO) matrix that is fully dense at f=2 and
      ~62% dense at f=4, applied as a (3, 1) conv (3 vertical taps, no
      horizontal reach);
    - **E** (cross-cell): exactly two tap streams — phase f-1 of cell j-1
      feeding output phase 0 through k[:, 0], and phase 0 of cell j+1
      feeding output phase f-1 through k[:, 2] — applied as a (3, 1) conv
      on the 2C-lane concat of those two shifted phase slices.

    Total: 3*(fC)*(fO) + 3*(2C)*(fO) MACs/cell vs 9*(fC)*(fO) for the
    single packed kernel — e.g. 49.2K vs 73.7K per pixel at C=O=64, f=2
    (-33%), 15*CO vs 36*CO per pixel at f=4 (-58%).  The E input costs one
    extra (B, H, Wp, 2C) materialization through HBM; a net win whenever
    the conv is MXU-bound (all HRNet packed shapes; measured on v5e).

    Returns ``(ka, ke)``: ka (3, 1, f*C, f*O), ke (3, 1, 2*C, f*O).
    """
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3, (kh, kw)
    f = factor
    z = jnp.zeros((3, c, o), k.dtype)
    rows = []
    for a_i in range(f):
        cols = []
        for a_o in range(f):
            dx = a_i - a_o
            cols.append(k[:, dx + 1] if -1 <= dx <= 1 else z)
        rows.append(jnp.concatenate(cols, axis=-1))     # (3, C, f*O)
    ka = jnp.concatenate(rows, axis=-2)[:, None]        # (3, 1, f*C, f*O)

    ke = jnp.zeros((3, 2 * c, f * o), k.dtype)
    ke = ke.at[:, :c, :o].set(k[:, 0])                  # cell j-1, phase f-1
    ke = ke.at[:, c:, (f - 1) * o:].set(k[:, 2])        # cell j+1, phase 0
    return ka, ke[:, None]


def conv3x3_packed_ae_xla(
    xp: jnp.ndarray, k: jnp.ndarray, factor: int = 2, preferred_dtype=None
) -> jnp.ndarray:
    """Exact stride-1 SAME 3x3 conv on width-packed input via A+E.

    xp: (B, H, Wp, f*C) packed input; k: (3, 3, C, O) logical kernel.
    Returns the packed (B, H, Wp, f*O) output — bit-compatible with
    ``conv_general_dilated(xp, pack_kernel_3x3(k), SAME)`` up to fp
    summation order.  See :func:`ae_kernels_3x3`.
    """
    f = factor
    c = k.shape[2]
    dt = preferred_dtype or xp.dtype
    ka, ke = ae_kernels_3x3(k, f)
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        xp, ka, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=dn, preferred_element_type=dt)
    # E input: [cell j-1 phase f-1 | cell j+1 phase 0]; zero-padding the
    # shifted-in boundary cells is exactly the logical SAME zero pad.
    left = jnp.pad(xp[:, :, :-1, (f - 1) * c:],
                   ((0, 0), (0, 0), (1, 0), (0, 0)))
    right = jnp.pad(xp[:, :, 1:, :c], ((0, 0), (0, 0), (0, 1), (0, 0)))
    e_in = jnp.concatenate([left, right], axis=-1)
    out = out + jax.lax.conv_general_dilated(
        e_in, ke, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=dn, preferred_element_type=dt)
    return out


def pack_kernel_3x3_stride2_in(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) -> (3, 2, 2C, O): stride-2 conv CONSUMING f=2-packed input.

    Output pixel w' (unpacked, stride-2 grid) is centered on original column
    2w'; its taps 2w'+dx for dx in {-1,0,1} live at packed cell (2w'+dx)//2,
    slot (2w'+dx)%2 — i.e. cells {w'-1, w'} only.  Use with
    ``window_strides=(2, 1)`` and padding ``((1,1),(1,0))`` on the packed
    (B, H, W/2, 2C) tensor; the result is the ordinary unpacked
    (B, H/2, W/2, O) stride-2 SAME conv output.
    """
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3, (kh, kw)
    z = jnp.zeros((3, c, o), k.dtype)
    cell0 = jnp.concatenate([z, k[:, 0]], axis=-2)          # dx=-1 in slot 1
    cell1 = jnp.concatenate([k[:, 1], k[:, 2]], axis=-2)    # dx=0/+1
    return jnp.stack([cell0, cell1], axis=1)                # (3, 2, 2C, O)


def conv3x3_wpacked(x: jnp.ndarray, k: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    preferred_dtype=None, factor: int = 2) -> jnp.ndarray:
    """Exact stride-1 SAME 3x3 conv computed in the width-packed layout.

    x: (B, H, W, C) with W % factor == 0; k: (3, 3, C, O) logical kernel.
    """
    xp = pack_w(x, factor)
    kp = pack_kernel_3x3(k, factor)
    out = jax.lax.conv_general_dilated(
        xp, kp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_dtype or x.dtype)
    out = unpack_w(out, factor)
    if bias is not None:
        out = out + bias
    return out


class PackedConv(nn.Module):
    """Drop-in stride-1 3x3 Conv that computes width-packed.

    Parameters are stored in the logical (3, 3, C, O) HWIO layout —
    checkpoint-compatible with ``blocks.Conv`` — and get re-packed per call
    (a tiny static gather XLA hoists out of the step loop).
    """
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dt = self.dtype or x.dtype
        return conv3x3_wpacked(
            x.astype(dt), kernel.astype(dt),
            bias.astype(dt) if bias is not None else None)
