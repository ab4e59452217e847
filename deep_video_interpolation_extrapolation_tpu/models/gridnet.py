"""GridNet generator (reference nets/grid_net.py:15-364): 3-row grid of
lateral/down/up flows with PReLU conv pairs.

The reference computes its losses inside ``forward`` when training
(grid_net.py:269-340); here the model is a pure function returning
(rgb_out, seg_out) and losses live in the train step — the TPU framework's
universal convention.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
)

Dtype = Any


def _prelu(x, module: nn.Module, name: str):
    a = module.param(name, nn.initializers.constant(0.25), (1,))
    return jnp.where(x >= 0, x, a * x)


class Lateral(nn.Module):
    """(PReLU->conv)x2 with optional conv shortcut (grid_net.py:15-51)."""
    out_ch: int
    kernel: int = 3
    shortcut_conv: bool = False
    prelu_first: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = x
        if self.prelu_first:
            h = _prelu(h, self, "a0")
            h = Conv(self.out_ch, self.kernel, dtype=self.dtype)(h)
            h = _prelu(h, self, "a1")
            h = Conv(self.out_ch, self.kernel, dtype=self.dtype)(h)
        else:
            h = Conv(self.out_ch, self.kernel, dtype=self.dtype)(h)
            h = _prelu(h, self, "a0")
            h = Conv(self.out_ch, self.kernel, dtype=self.dtype)(h)
            h = _prelu(h, self, "a1")
            h = Conv(self.out_ch, self.kernel, dtype=self.dtype)(h)
        if self.shortcut_conv:
            if x.shape[-1] != self.out_ch:
                return h + Conv(self.out_ch, self.kernel, dtype=self.dtype)(x)
            return h + x
        return h


class _UpSample(nn.Module):
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = interpolate_bilinear(x, scale_factor=2.0, align_corners=True)
        h = _prelu(h, self, "a0")
        h = Conv(self.out_ch, 3, dtype=self.dtype)(h)
        h = _prelu(h, self, "a1")
        return Conv(self.out_ch, 3, dtype=self.dtype)(h)


class _DownSample(nn.Module):
    out_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = _prelu(x, self, "a0")
        h = Conv(self.out_ch, 3, stride=2, dtype=self.dtype)(h)
        h = _prelu(h, self, "a1")
        return Conv(self.out_ch, 3, dtype=self.dtype)(h)


class Downflow(nn.Module):
    chans: Tuple[int, int, int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, r0, r1, r2):
        r0 = Lateral(self.chans[0], dtype=self.dtype, name="row0")(r0)
        r1 = Lateral(self.chans[1], dtype=self.dtype, name="row1")(r1)
        r2 = Lateral(self.chans[2], dtype=self.dtype, name="row2")(r2)
        r1 = _DownSample(self.chans[1], dtype=self.dtype, name="down01")(r0) + r1
        r2 = _DownSample(self.chans[2], dtype=self.dtype, name="down12")(r1) + r2
        return r0, r1, r2


class Upflow(nn.Module):
    chans: Tuple[int, int, int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, r0, r1, r2):
        r0 = Lateral(self.chans[0], dtype=self.dtype, name="row0")(r0)
        r1 = Lateral(self.chans[1], dtype=self.dtype, name="row1")(r1)
        r2 = Lateral(self.chans[2], dtype=self.dtype, name="row2")(r2)
        r1 = _UpSample(self.chans[1], dtype=self.dtype, name="up21")(r2) + r1
        r0 = _UpSample(self.chans[0], dtype=self.dtype, name="up10")(r1) + r0
        return r0, r1, r2


class GridNet(nn.Module):
    """3x6 grid generator (grid_net.py:140-263).  Call ``(x)`` with the
    mode's channel-concat input; returns (rgb_out, seg_out) where either may
    be None depending on mode."""
    mode: str = "xs2xs"
    n_channels: Tuple[int, int, int] = (32, 64, 96)
    n_classes: int = 20
    split_tail: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ch = self.n_channels
        r0 = Lateral(ch[0], shortcut_conv=True, prelu_first=False,
                     dtype=self.dtype, name="head")(x)
        r1 = _DownSample(ch[1], dtype=self.dtype, name="neck_down01")(r0)
        r2 = _DownSample(ch[2], dtype=self.dtype, name="neck_down12")(r1)

        r0, r1, r2 = Downflow(ch, dtype=self.dtype, name="body_down0")(r0, r1, r2)
        r0, r1, r2 = Downflow(ch, dtype=self.dtype, name="body_down1")(r0, r1, r2)
        r0, r1, r2 = Upflow(ch, dtype=self.dtype, name="body_up0")(r0, r1, r2)
        r0, r1, r2 = Upflow(ch, dtype=self.dtype, name="body_up1")(r0, r1, r2)
        r0, r1, r2 = Upflow(ch, dtype=self.dtype, name="body_up2")(r0, r1, r2)

        if self.mode == "x2x":
            return Lateral(3, dtype=self.dtype, name="tail")(r0), None
        if self.mode in ("s2s", "xs2s", "wing"):
            return None, Lateral(self.n_classes, dtype=self.dtype, name="tail")(r0)
        if self.mode == "xs2x":
            return Lateral(3, dtype=self.dtype, name="tail")(r0), None
        # xs2xs
        if self.split_tail:
            rgb = Lateral(3, dtype=self.dtype, name="tail")(r0)
            seg = Lateral(self.n_classes, dtype=self.dtype, name="tail_seg")(r0)
        else:
            out = Lateral(3 + self.n_classes, dtype=self.dtype, name="tail")(r0)
            rgb, seg = out[..., :3], out[..., 3:]
        return rgb, seg
