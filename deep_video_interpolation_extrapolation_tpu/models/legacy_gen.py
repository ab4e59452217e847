"""Legacy generators (reference nets/MyFRRN.py, PSPNet.py, B2SNet.py,
grid_net.py) — the pre-HRNet coarse models, addressable by the same names.

All Flax/NHWC.  Call convention normalized to ``(rgb, seg, train)`` with
rgb (B,H,W,6) two-frame concat and seg (B,H,W,40) one-hot concat, returning
``(rgb_out, seg_out)`` (seg_out None for xx2x), like the rest of the zoo —
the reference passed a single channel-concat ``input`` tensor and sliced it
internally (nets/MyFRRN.py:172-186).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    SegEncoder,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
)

Dtype = Any


class FRRU(nn.Module):
    """Full-resolution residual unit (nets/MyFRRN.py:6-45): pooled stream y
    convs with downsampled z; z gets the upsampled transform back."""
    z_ch: int
    y_ch: int
    scale: int
    botneck: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, y):
        down_z = Conv(self.y_ch, 1 + self.scale, stride=self.scale,
                      padding=(1 + self.scale) // 2, dtype=self.dtype)(z)
        h = jnp.concatenate([down_z, y], axis=-1)
        h = nn.elu(Conv(self.y_ch, 3, dtype=self.dtype)(h))
        if self.botneck:
            for rate in (2, 4, 8):
                h = nn.elu(Conv(self.y_ch, 3, dilation=rate, dtype=self.dtype)(h))
        h = nn.elu(Conv(self.y_ch, 3, dtype=self.dtype)(h))
        out_y = h
        t = interpolate_bilinear(h, scale_factor=float(self.scale),
                                 align_corners=True)
        t = nn.elu(Conv(self.z_ch, 3, dtype=self.dtype)(t))
        t = Conv(self.z_ch, 3, dtype=self.dtype)(t)
        return z + t, out_y


class _HeadBlock(nn.Module):
    """4-conv ELU block + conv shortcut (nets/MyFRRN.py:47-62)."""
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.elu(Conv(64, 3, dtype=self.dtype)(x))
        h = nn.elu(Conv(128, 3, dtype=self.dtype)(h))
        h = nn.elu(Conv(128, 3, dtype=self.dtype)(h))
        h = Conv(self.out_ch, 3, dtype=self.dtype)(h)
        return h + Conv(self.out_ch, 3, dtype=self.dtype)(x)


class MyFRRN(nn.Module):
    """FRRN-style 2-stream generator (nets/MyFRRN.py:124-211)."""
    mode: str = "xs2xs"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg=None, train: bool = True):
        if self.mode == "xs2xs":
            enc = SegEncoder(dtype=self.dtype, name="seg_encoder")
            feat = jnp.concatenate(
                [rgb, enc(seg[..., :20]), enc(seg[..., 20:40])], axis=-1)
        else:
            feat = rgb[..., :6]

        z0 = _HeadBlock(32, dtype=self.dtype, name="head_conv")(feat)
        # down 2
        y0 = nn.elu(Conv(64, 3, stride=2, dtype=self.dtype)(nn.elu(z0)))
        z1, y1 = FRRU(32, 64, 2, dtype=self.dtype, name="frru_d2")(z0, y0)
        # down 4
        y1 = nn.elu(Conv(96, 3, stride=2, dtype=self.dtype)(y1))
        z2, y2 = FRRU(32, 96, 4, botneck=True, dtype=self.dtype,
                      name="frru_bottleneck")(z1, y1)
        # up
        y2 = nn.elu(Conv(64, 3, dtype=self.dtype)(
            interpolate_bilinear(y2, scale_factor=2.0, align_corners=True)))
        z3, _ = FRRU(32, 64, 2, dtype=self.dtype, name="frru_u2")(z2, y2)

        h = nn.elu(z3)
        h = nn.elu(Conv(32, 3, dtype=self.dtype)(h))
        rgb_out = jnp.tanh(
            Conv(3, 3, dtype=self.dtype)(h) + Conv(3, 3, dtype=self.dtype)(z3))
        seg_out = None
        if self.mode == "xs2xs":
            s = nn.elu(Conv(64, 3, dtype=self.dtype)(nn.elu(z3)))
            seg_out = Conv(20, 3, dtype=self.dtype)(s)
        return rgb_out, seg_out


class _PSPResBlock(nn.Module):
    features: int
    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = lrelu(Conv(self.features, self.kernel, dtype=self.dtype)(x))
        h = Conv(self.features, self.kernel, dtype=self.dtype)(h)
        return h + x


class PSPConv(nn.Module):
    """Pyramid-scale conv block (nets/PSPNet.py:20-55).  v2 threads per-scale
    features to the next block (nets/PSPNet.py:133-172)."""
    out_dim: int = 64
    n_scales: int = 3
    layers: int = 2
    inter_dims: Tuple[int, ...] = (64, 128, 256)
    v2: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, feats=None):
        outs, out_feats = [], []
        for i in range(self.n_scales):
            h = x
            for _ in range(i):
                h = lrelu(Conv(self.inter_dims[i], 3, stride=2,
                               dtype=self.dtype)(h))
            if self.v2 and feats is not None:
                h = h + feats[i]
            for _ in range(self.layers):
                h = _PSPResBlock(self.inter_dims[i], dtype=self.dtype)(h)
            out_feats.append(h)
            if i > 0:
                h = interpolate_bilinear(h, scale_factor=float(2 ** i),
                                         align_corners=True)
            outs.append(h)
        out = jnp.concatenate(outs, axis=-1)
        out = Conv(self.out_dim, 3, dtype=self.dtype)(lrelu(out))
        if self.v2:
            return out, out_feats
        return out


class PSPNet(nn.Module):
    """4x PSPConv stack (nets/PSPNet.py:58-130 / 175-246 for V2)."""
    mode: str = "xs2xs"
    v2: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg=None, train: bool = True):
        if self.mode == "xs2xs":
            enc = SegEncoder(dtype=self.dtype, name="seg_encoder")
            feat = jnp.concatenate(
                [rgb, enc(seg[..., :20]), enc(seg[..., 20:40])], axis=-1)
        else:
            feat = rgb[..., :6]
        h = Conv(64, 3, dtype=self.dtype)(feat)
        h = Conv(64, 3, dtype=self.dtype)(lrelu(h))
        feats = None
        for i in range(4):
            block = PSPConv(v2=self.v2, dtype=self.dtype, name=f"pspconv_{i}")
            if self.v2:
                h, feats = block(h, feats)
            else:
                h = block(h)
        r = lrelu(Conv(32, 3, dtype=self.dtype)(lrelu(h)))
        rgb_out = jnp.clip(Conv(3, 3, dtype=self.dtype)(r), -1, 1)
        seg_out = None
        if self.mode == "xs2xs":
            s = lrelu(Conv(64, 3, dtype=self.dtype)(lrelu(h)))
            seg_out = Conv(20, 3, dtype=self.dtype)(s)
        return rgb_out, seg_out


def PSPNetV2(mode: str = "xs2xs", dtype=None) -> PSPNet:
    return PSPNet(mode=mode, v2=True, dtype=dtype)


class _B2SConv(nn.Module):
    """Coarse-to-fine conv cascade cell (nets/B2SNet.py:8-39)."""
    med_dim: int
    out_dim: int
    n_conv: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = None
        for i in range(self.n_conv):
            last = i == self.n_conv - 1
            if not last:
                scale = 2 ** (self.n_conv - 1 - i)
                scaled = interpolate_bilinear(
                    x, scale_factor=1.0 / scale, align_corners=True)
            else:
                scaled = x
            inp = scaled if out is None else jnp.concatenate([scaled, out], -1)
            out = lrelu(Conv(self.out_dim if last else self.med_dim, 3,
                             dtype=self.dtype)(inp))
            if not last:
                out = interpolate_bilinear(out, scale_factor=2.0,
                                           align_corners=True)
        return out


class _B2SModule(nn.Module):
    med_dim: int
    out_dim: int
    n_scales: int = 2
    n_conv: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = None
        for i in range(self.n_scales):
            last = i == self.n_scales - 1
            if not last:
                scale = 2 ** (self.n_scales - 1 - i)
                scaled = interpolate_bilinear(
                    x, scale_factor=1.0 / scale, align_corners=True)
            else:
                scaled = x
            inp = scaled if out is None else jnp.concatenate([scaled, out], -1)
            out = _B2SConv(self.med_dim, self.out_dim if last else self.med_dim,
                           self.n_conv, dtype=self.dtype)(inp)
            if not last:
                out = interpolate_bilinear(out, scale_factor=2.0,
                                           align_corners=True)
        return out


class B2SNet(nn.Module):
    """Big-to-small multiscale cascade, xx2x only (nets/B2SNet.py:72-113)."""
    n_scales: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg=None, train: bool = True):
        x = rgb[..., :6]
        out = None
        for i in range(self.n_scales):
            last = i == self.n_scales - 1
            if not last:
                scale = 2 ** (self.n_scales - 1 - i)
                scaled = interpolate_bilinear(
                    x, scale_factor=1.0 / scale, align_corners=True)
            else:
                scaled = x
            inp = scaled if out is None else jnp.concatenate([scaled, out], -1)
            out = _B2SModule(64, 64, 2, 2, dtype=self.dtype,
                             name=f"conv{i}")(inp)
            if not last:
                out = interpolate_bilinear(out, scale_factor=2.0,
                                           align_corners=True)
        h = lrelu(Conv(32, 3, dtype=self.dtype)(out))
        return Conv(3, 3, dtype=self.dtype)(h), None
