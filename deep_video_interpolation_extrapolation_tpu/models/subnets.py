"""Shared legacy sub-networks (reference nets/SubNets.py, nets/vgg.py
encoder/decoder/RefineNet/Flow2Frame_warped).

Used by the flow-based video VAE family (models/vae_video.py) and the
legacy runners.  NHWC; the 3-D gated convs keep time as a real depth axis
(NDHWC conv) exactly like the reference's ``nn.Conv3d``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv, lrelu
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
    max_pool,
)

Dtype = Any


class SegEncoderBN(nn.Module):
    """BatchNorm variant of the seg encoder (nets/SubNets.py:14-30)."""
    out_dim: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, seg, train: bool = True):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        x = lrelu(bn(Conv(32, 3, dtype=self.dtype)(seg)))
        x = lrelu(bn(Conv(32, 3, dtype=self.dtype)(x)))
        return Conv(self.out_dim, 3, dtype=self.dtype)(x)


class FlowEncoder(nn.Module):
    """VAE posterior encoder -> (mu, logvar) (nets/SubNets.py:38-67).

    The reference flattens to a fixed 1024 vector (assuming 128x128 inputs);
    here the flatten adapts to the actual spatial size.
    """
    latent_dim: int = 512
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = lrelu(Conv(64, 5, stride=2, use_bias=False, dtype=self.dtype)(x))
        h = lrelu(bn(Conv(64, 5, stride=2, use_bias=False, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(64, 3, use_bias=False, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(128, 5, stride=2, padding=1, use_bias=False,
                          dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(128, 3, use_bias=False, dtype=self.dtype)(h)))
        h = Conv(48, 5, stride=2, use_bias=False, dtype=self.dtype)(h)
        flat = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="mu_fc")(flat)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype, name="logvar_fc")(flat)
        return mu, logvar


class GateConv3d(nn.Module):
    """3-D conv + BN + lrelu over (B, T, H, W, C) (nets/SubNets.py:76-84)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(self.features, kernel_size=(3, 3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        return lrelu(h)


class ConvBlock(nn.Module):
    """conv + BN + lrelu (nets/SubNets.py:89-99)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv(self.features, self.kernel, self.stride, use_bias=False,
                 dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        return lrelu(h)


class ConvBase(nn.Module):
    """conv + lrelu (nets/SubNets.py:105-113)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return lrelu(Conv(self.features, self.kernel, self.stride,
                          dtype=self.dtype)(x))


class UpConv(nn.Module):
    """2x(conv+BN+lrelu) then 2x bilinear upsample (nets/SubNets.py:116-135)."""
    features: int
    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvBlock(self.features * 2, self.kernel, dtype=self.dtype)(x, train)
        h = ConvBlock(self.features, self.kernel, dtype=self.dtype)(h, train)
        return interpolate_bilinear(h, scale_factor=2.0, align_corners=False)


class FrameEncoder(nn.Module):
    """frame+seg -> (enco1, enco2, enco3, codex) pyramid
    (nets/SubNets.py:143-183)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        e1 = ConvBase(32, dtype=self.dtype)(x)
        e1 = ConvBlock(32, dtype=self.dtype)(e1, train)
        e2 = ConvBlock(64, 5, 2, dtype=self.dtype)(e1, train)
        e2 = ConvBlock(64, dtype=self.dtype)(e2, train)
        e2 = ConvBlock(64, dtype=self.dtype)(e2, train)
        e3 = ConvBlock(128, 5, 2, dtype=self.dtype)(e2, train)
        e3 = ConvBlock(128, dtype=self.dtype)(e3, train)
        e3 = ConvBlock(128, dtype=self.dtype)(e3, train)
        c = ConvBlock(256, 5, 2, dtype=self.dtype)(e3, train)
        c = ConvBlock(256, dtype=self.dtype)(c, train)
        return e1, e2, e3, c


class FlowDecoder(nn.Module):
    """Skip-connected flow decoder over T timesteps (nets/SubNets.py:186-228).

    The reference interleaves batch-folded 2-D convs with time-axis 3-D
    gateconvs via chunk/unbind gymnastics; here time is an explicit axis:
    z (B, T, h, w, C) -> (B, T, 4h, 4w, 64), with the single-frame skips
    broadcast over T.
    """
    vid_length: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, enco1, enco2, enco3, z, train: bool = True):
        b, t = z.shape[0], z.shape[1]

        def fold(v):
            return v.reshape((b * t,) + v.shape[2:])

        def unfold(v):
            return v.reshape((b, t) + v.shape[1:])

        def skip(v):
            return jnp.broadcast_to(v[:, None], (b, t) + v.shape[1:])

        d1 = unfold(ConvBlock(256, dtype=self.dtype)(fold(z), train))
        d2 = unfold(UpConv(128, dtype=self.dtype)(fold(d1), train))
        d2 = jnp.concatenate([d2, skip(enco3)], axis=-1)
        d3 = unfold(UpConv(64, dtype=self.dtype)(fold(d2), train))
        d3 = GateConv3d(64, dtype=self.dtype)(d3, train)
        d3 = jnp.concatenate([d3, skip(enco2)], axis=-1)
        d4 = unfold(UpConv(32, dtype=self.dtype)(fold(d3), train))
        d4 = GateConv3d(32, dtype=self.dtype)(d4, train)
        d4 = jnp.concatenate([d4, skip(enco1)], axis=-1)
        return d4  # (B, T, H, W, 64)


class _HeadConvs(nn.Module):
    """The upconv-style conv pair of the mini-heads WITHOUT the trailing
    2x upsample.  The reference chains encoder(/8) -> 3-up decoder (full
    res) -> upconv head (2x full res!?) — its spatial bookkeeping only
    closes because the legacy runners fed pre-halved inputs.  Here the
    decoder already restores full resolution, so the heads stay
    resolution-preserving (documented deviation from nets/SubNets.py:232)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ConvBlock(32, 5, dtype=self.dtype)(x, train)
        return ConvBlock(16, 5, dtype=self.dtype)(h, train)


class GetFlow(nn.Module):
    """conv head -> 2-ch flow (nets/SubNets.py:232-241)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _HeadConvs(dtype=self.dtype)(x, train)
        return Conv(2, 5, dtype=self.dtype)(h)


class GetOcclusionMask(nn.Module):
    """conv head + sigmoid -> 2-ch mask (nets/SubNets.py:247-256)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _HeadConvs(dtype=self.dtype)(x, train)
        return nn.sigmoid(Conv(2, 5, dtype=self.dtype)(h))


class GetFrames(nn.Module):
    """conv head + sigmoid -> rgb (nets/SubNets.py:262-272)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _HeadConvs(dtype=self.dtype)(x, train)
        return nn.sigmoid(Conv(3, 5, dtype=self.dtype)(h))


# ------------------------------------------------------ nets/vgg.py legacy
class VGGLayer(nn.Module):
    """conv + BN + lrelu (nets/vgg.py:58-67)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = Conv(self.features, 3, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        return lrelu(h)


class LegacyEncoder(nn.Module):
    """VGG-ish encoder to a 1x1 code + skips (nets/vgg.py:69-113)."""
    dim: int = 1024
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def mp(v):
            return max_pool(v, (2, 2))
        h1 = VGGLayer(64, dtype=self.dtype)(x, train)
        h1 = VGGLayer(64, dtype=self.dtype)(h1, train)
        h2 = VGGLayer(128, dtype=self.dtype)(mp(h1), train)
        h2 = VGGLayer(128, dtype=self.dtype)(h2, train)
        h3 = VGGLayer(256, dtype=self.dtype)(mp(h2), train)
        h3 = VGGLayer(256, dtype=self.dtype)(h3, train)
        h3 = VGGLayer(256, dtype=self.dtype)(h3, train)
        h4 = VGGLayer(512, dtype=self.dtype)(mp(h3), train)
        h4 = VGGLayer(512, dtype=self.dtype)(h4, train)
        h4 = VGGLayer(512, dtype=self.dtype)(h4, train)
        h5 = VGGLayer(512, dtype=self.dtype)(mp(h4), train)
        h5 = VGGLayer(512, dtype=self.dtype)(h5, train)
        h5 = VGGLayer(512, dtype=self.dtype)(h5, train)
        h6 = mp(h5)
        # 4x4 VALID conv -> 1x1 code (nets/vgg.py:100-104), size-agnostic via
        # kernel = spatial extent
        k = (h6.shape[1], h6.shape[2])
        h6 = nn.Conv(self.dim, kernel_size=k, padding="VALID",
                     dtype=self.dtype)(h6)
        h6 = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h6)
        return jnp.tanh(h6), [h1, h2, h3, h4, h5]


class LegacyDecoder(nn.Module):
    """Skip decoder from a 1x1 code (nets/vgg.py:120-176)."""
    nc: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, code_and_skips, train: bool = True):
        vec, skips = code_and_skips
        h1, h2, h3, h4, h5 = skips
        up4 = (h5.shape[1], h5.shape[2])
        d1 = lrelu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(
            nn.ConvTranspose(512, kernel_size=(4, 4), padding="VALID",
                             dtype=self.dtype)(vec)))
        d1 = interpolate_bilinear(d1, size=up4, align_corners=False)
        d2 = VGGLayer(512, dtype=self.dtype)(jnp.concatenate([d1, h5], -1), train)
        d2 = VGGLayer(512, dtype=self.dtype)(d2, train)
        d2 = VGGLayer(512, dtype=self.dtype)(d2, train)
        d2 = interpolate_bilinear(d2, size=(h4.shape[1], h4.shape[2]),
                                  align_corners=False)
        d3 = VGGLayer(512, dtype=self.dtype)(jnp.concatenate([d2, h4], -1), train)
        d3 = VGGLayer(512, dtype=self.dtype)(d3, train)
        d3 = VGGLayer(256, dtype=self.dtype)(d3, train)
        d3 = interpolate_bilinear(d3, size=(h3.shape[1], h3.shape[2]),
                                  align_corners=False)
        d4 = VGGLayer(256, dtype=self.dtype)(jnp.concatenate([d3, h3], -1), train)
        d4 = VGGLayer(256, dtype=self.dtype)(d4, train)
        d4 = VGGLayer(128, dtype=self.dtype)(d4, train)
        d4 = interpolate_bilinear(d4, size=(h2.shape[1], h2.shape[2]),
                                  align_corners=False)
        d5 = VGGLayer(128, dtype=self.dtype)(jnp.concatenate([d4, h2], -1), train)
        d5 = VGGLayer(64, dtype=self.dtype)(d5, train)
        d5 = interpolate_bilinear(d5, size=(h1.shape[1], h1.shape[2]),
                                  align_corners=False)
        d6 = VGGLayer(64, dtype=self.dtype)(jnp.concatenate([d5, h1], -1), train)
        out = nn.ConvTranspose(self.nc, kernel_size=(3, 3), padding="SAME",
                               dtype=self.dtype)(d6)
        return nn.sigmoid(out)


class LegacyRefineNet(nn.Module):
    """Encoder-decoder refinement without flow encoder (nets/vgg.py:190-206)."""
    nc: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, warped_img, flow=None, train: bool = True):
        code, skips = LegacyEncoder(1024, dtype=self.dtype,
                                    name="image_encoder")(warped_img, train)
        return LegacyDecoder(self.nc, dtype=self.dtype,
                             name="image_decoder")((code, skips), train)


class Flow2FrameWarped(nn.Module):
    """Image+flow dual-encoder decoder (nets/vgg.py:179-188)."""
    nc: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, warped_img, flow, train: bool = True):
        icode, iskips = LegacyEncoder(1024, dtype=self.dtype,
                                      name="image_encoder")(warped_img, train)
        fcode, _ = LegacyEncoder(512, dtype=self.dtype,
                                 name="flow_encoder")(flow, train)
        code = jnp.concatenate([icode, fcode], axis=-1)
        return LegacyDecoder(self.nc, dtype=self.dtype,
                             name="image_decoder")((code, iskips), train)
