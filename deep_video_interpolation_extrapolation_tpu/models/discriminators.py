"""Frame/Video discriminator families (reference nets/FrameDisc.py, nets/VidDisc.py).

Spectral normalization uses ``flax.linen.SpectralNorm`` (power-iteration u/v
vectors live in ``batch_stats`` and update during train steps), the Flax
equivalent of the reference's hand-rolled ``SpectralNorm`` wrapper
(nets/SpectralNorm.py:14-68, 1 power iteration per forward).

Global discriminators end in mean pooling to a scalar per sample; the
reference uses ``AvgPool2d(8)`` on an assumed 128x128 input then a channel
mean (nets/FrameDisc.py:66-75) — here that is a global spatial+channel mean,
identical at 128x128 and shape-agnostic elsewhere.

Layout: NHWC; ``seg_disc`` concatenates the 20-ch one-hot seg (in_dim 23).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv, lrelu

Dtype = Any


class _SNConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        pad = self.padding if self.padding is not None else self.kernel // 2
        conv = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
        )
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class _Block(nn.Module):
    """conv (optionally SN / BN) + optional lrelu, one config step."""
    features: int
    kernel: int = 3
    stride: int = 1
    sn: bool = False
    bn: bool = False
    act: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.sn:
            x = _SNConv(self.features, self.kernel, self.stride, dtype=self.dtype)(
                x, update_stats=train)
        else:
            x = Conv(self.features, self.kernel, self.stride, dtype=self.dtype)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        if self.act:
            x = lrelu(x)
        return x


class _ResBlock(nn.Module):
    features: int
    sn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _Block(self.features, sn=self.sn, dtype=self.dtype)(x, train)
        h = _Block(self.features, sn=self.sn, act=False, dtype=self.dtype)(h, train)
        return h + x


def _scalar_head(x: jnp.ndarray) -> jnp.ndarray:
    """Global mean over (H, W, C) -> (B,) scalar logits."""
    return jnp.mean(x, axis=(1, 2, 3))


class FrameDiscriminator(nn.Module):
    """Global single-frame discriminator (nets/FrameDisc.py:35-75)."""
    seg_disc: bool = False
    sn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, seg=None, bboxes=None, train: bool = True):
        if self.seg_disc:
            x = jnp.concatenate([x, seg], axis=-1)
        d = self.dtype
        h = _Block(16, 3, sn=self.sn, dtype=d)(x, train)
        h = _Block(32, 5, sn=self.sn, bn=not self.sn, dtype=d)(h, train)
        # SN variant stops at 128ch/3 downsamples (nets/FrameDisc.py:128-147)
        chans = (64, 96, 128) if self.sn else (64, 96, 128, 192)
        for ch in chans:
            h = _Block(ch, 3, stride=2, sn=self.sn, dtype=d)(h, train)
            h = _ResBlock(ch, sn=self.sn, dtype=d)(h, train)
        h = _Block(h.shape[-1], 3, sn=self.sn, act=False, dtype=d)(h, train)
        return _scalar_head(h)


class FrameLocalDiscriminator(nn.Module):
    """Patch-map single-frame discriminator (nets/FrameDisc.py:77-114)."""
    seg_disc: bool = False
    sn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, seg=None, bboxes=None, train: bool = True):
        if self.seg_disc:
            x = jnp.concatenate([x, seg], axis=-1)
        d = self.dtype
        bn = not self.sn
        h = _Block(16, 3, sn=self.sn, dtype=d)(x, train)
        h = _Block(32, 5, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        if self.sn:
            h = _SNConv(1, 1, 1, padding=0, dtype=d)(h, update_stats=train)
        else:
            h = Conv(1, 1, 1, padding=0, dtype=d)(h)
        return h


def FrameSNDiscriminator(seg_disc: bool = False, dtype=None):
    return FrameDiscriminator(seg_disc=seg_disc, sn=True, dtype=dtype)


def FrameSNLocalDiscriminator(seg_disc: bool = False, dtype=None):
    return FrameLocalDiscriminator(seg_disc=seg_disc, sn=True, dtype=dtype)


class VideoDiscriminator(nn.Module):
    """Global 3-frame discriminator (nets/VidDisc.py:34-84)."""
    seg_disc: bool = False
    sn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, seg=None, input_x=None, input_seg=None, bboxes=None,
                 train: bool = True):
        if self.seg_disc:
            inp = jnp.concatenate([x, seg, input_x, input_seg], axis=-1)
        else:
            inp = jnp.concatenate([x, input_x], axis=-1)
        d = self.dtype
        h = _Block(32, 3, sn=self.sn, dtype=d)(inp, train)
        h = _Block(64, 5, sn=self.sn, bn=not self.sn, dtype=d)(h, train)
        h = _Block(32, 3, sn=self.sn, bn=not self.sn, dtype=d)(h, train)
        chans = (32, 64, 128) if self.sn else (32, 64, 128, 256)
        for ch in chans:
            h = _Block(ch, 3, stride=2, sn=self.sn, dtype=d)(h, train)
            h = _ResBlock(ch, sn=self.sn, dtype=d)(h, train)
        h = _Block(h.shape[-1], 3, sn=self.sn, act=False, dtype=d)(h, train)
        return _scalar_head(h)


class VideoLocalDiscriminator(nn.Module):
    """Patch-map 3-frame discriminator (nets/VidDisc.py:87-138)."""
    seg_disc: bool = False
    sn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, seg=None, input_x=None, input_seg=None, bboxes=None,
                 train: bool = True):
        if self.seg_disc:
            inp = jnp.concatenate([x, seg, input_x, input_seg], axis=-1)
        else:
            inp = jnp.concatenate([x, input_x], axis=-1)
        d = self.dtype
        bn = not self.sn
        h = _Block(64, 1, sn=self.sn, dtype=d)(inp, train)
        h = _Block(64, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(128, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(256, 3, stride=2, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(256, 3, sn=self.sn, bn=bn, dtype=d)(h, train)
        h = _Block(64, 1, sn=self.sn, bn=bn, dtype=d)(h, train)
        if self.sn:
            h = _SNConv(1, 1, 1, padding=0, dtype=d)(h, update_stats=train)
        else:
            h = Conv(1, 1, 1, padding=0, dtype=d)(h)
        return h


def VideoSNDiscriminator(seg_disc: bool = False, dtype=None):
    return VideoDiscriminator(seg_disc=seg_disc, sn=True, dtype=dtype)


def VideoSNLocalDiscriminator(seg_disc: bool = False, dtype=None):
    return VideoLocalDiscriminator(seg_disc=seg_disc, sn=True, dtype=dtype)
