"""UNet & SepUNet generators (reference nets/UNet.py:16-157, nets/SepUNet.py:12-71).

Flax NHWC rewrites.  These use BatchNorm (unlike HRNet where the reference
disabled it), so they carry a ``batch_stats`` collection and take ``train``.
Like the reference, BatchNorm stats are per-replica (DDP did not sync BN).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    SegEncoder,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import interpolate_bilinear

Dtype = Any


class DoubleConv(nn.Module):
    """(conv => BN => LeakyReLU) * 2 (nets/UNet.py:16-31)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(2):
            x = Conv(self.features, 3, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = lrelu(x)
        return x


class Down(nn.Module):
    """stride-2 conv + BN + LeakyReLU + double_conv (nets/UNet.py:47-62)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.features, 3, stride=2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = lrelu(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


class Up(nn.Module):
    """bilinear 2x upsample + double_conv (nets/UNet.py:65-96)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip=None, train: bool = True):
        x = interpolate_bilinear(x, scale_factor=2.0, align_corners=True)
        if skip is not None:
            x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


class UNet(nn.Module):
    """4-down/4-up UNet with SegEncoder and tanh rgb head (nets/UNet.py:109-157).

    Call: ``(rgb, seg)`` — rgb (B,H,W,6) two frames, seg (B,H,W,40) one-hot.
    """
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg, train: bool = True):
        seg_enc = SegEncoder(dtype=self.dtype, name="seg_encoder")
        encoded = jnp.concatenate(
            [seg_enc(seg[..., i * 20:(i + 1) * 20]) for i in range(2)], axis=-1
        )
        x = jnp.concatenate([rgb, encoded], axis=-1)

        e0 = DoubleConv(64, dtype=self.dtype, name="encoder_0")(x, train=train)
        e1 = Down(128, dtype=self.dtype, name="encoder_1")(e0, train=train)
        e2 = Down(256, dtype=self.dtype, name="encoder_2")(e1, train=train)
        e3 = Down(256, dtype=self.dtype, name="encoder_3")(e2, train=train)

        d3 = Up(256, dtype=self.dtype, name="decoder_3")(e3, train=train)
        d2 = Up(128, dtype=self.dtype, name="decoder_2")(
            jnp.concatenate([d3, e2], axis=-1), train=train)
        d1 = Up(64, dtype=self.dtype, name="decoder_1")(
            jnp.concatenate([d2, e1], axis=-1), train=train)
        d0 = DoubleConv(32, dtype=self.dtype, name="decoder_0")(
            jnp.concatenate([d1, e0], axis=-1), train=train)

        out_rgb = jnp.tanh(Conv(3, 3, dtype=self.dtype, name="rgb_decoder")(d0))
        out_seg = Conv(20, 3, dtype=self.dtype, name="seg_decoder")(d0)
        return out_rgb, out_seg


class SepUNet(nn.Module):
    """Separate fg/bg-stream UNet (nets/SepUNet.py:12-71).

    Seg embeddings are split by a per-frame foreground mask into two encoder
    streams; decoder consumes both streams' skips.
    Call: ``(rgb, seg, fg_mask)`` with fg_mask (B,H,W,2).
    """
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg, fg_mask, train: bool = True):
        seg_enc = SegEncoder(dtype=self.dtype, name="seg_encoder")
        enc = [seg_enc(seg[..., i * 20:(i + 1) * 20]) for i in range(2)]
        fg = jnp.concatenate(
            [enc[i] * fg_mask[..., i:i + 1] for i in range(2)], axis=-1)
        bg = jnp.concatenate(
            [enc[i] * (1 - fg_mask[..., i:i + 1]) for i in range(2)], axis=-1)
        x_fg = jnp.concatenate([rgb, fg], axis=-1)
        x_bg = jnp.concatenate([rgb, bg], axis=-1)

        def stream(x, prefix):
            e0 = DoubleConv(32, dtype=self.dtype, name=f"{prefix}_encoder_0")(x, train=train)
            e1 = Down(64, dtype=self.dtype, name=f"{prefix}_encoder_1")(e0, train=train)
            e2 = Down(128, dtype=self.dtype, name=f"{prefix}_encoder_2")(e1, train=train)
            e3 = Down(128, dtype=self.dtype, name=f"{prefix}_encoder_3")(e2, train=train)
            return e0, e1, e2, e3

        f0, f1, f2, f3 = stream(x_fg, "fg")
        b0, b1, b2, b3 = stream(x_bg, "bg")

        d3 = Up(256, dtype=self.dtype, name="decoder_3")(
            jnp.concatenate([f3, b3], axis=-1), train=train)
        d2 = Up(128, dtype=self.dtype, name="decoder_2")(
            jnp.concatenate([d3, f2, b2], axis=-1), train=train)
        d1 = Up(64, dtype=self.dtype, name="decoder_1")(
            jnp.concatenate([d2, f1, b1], axis=-1), train=train)
        d0 = DoubleConv(32, dtype=self.dtype, name="decoder_0")(
            jnp.concatenate([d1, f0, b0], axis=-1), train=train)

        out_rgb = jnp.tanh(Conv(3, 3, dtype=self.dtype, name="rgb_decoder")(d0))
        out_seg = Conv(20, 3, dtype=self.dtype, name="seg_decoder")(d0)
        return out_rgb, out_seg
