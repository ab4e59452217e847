"""Legacy discriminators: pix2pixHD-style multiscale PatchGAN and the
motion discriminator (reference nets/multi_scale_discriminator.py,
nets/motion_discriminator.py)."""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv, lrelu
from deep_video_interpolation_extrapolation_tpu.ops.resize import avg_pool

Dtype = Any


class NLayerDiscriminator(nn.Module):
    """PatchGAN tower (nets/multi_scale_discriminator.py:57-126): 5x5 convs
    with BN, strides 1,1,2,1,2,1,4,1, 1-ch patch head, optional sigmoid.
    ``get_interm_feat`` returns every stage's activation."""
    ndf: int = 64
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = []
        plan = [  # (features, kernel, stride)
            (self.ndf, 5, 1), (self.ndf, 5, 1),
            (2 * self.ndf, 5, 2), (2 * self.ndf, 5, 1),
            (2 * self.ndf, 5, 2), (2 * self.ndf, 5, 1),
            (4 * self.ndf, 5, 4), (4 * self.ndf, 5, 1),
        ]
        h = x
        for ch, k, s in plan:
            h = Conv(ch, k, s, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
            h = lrelu(h)
            feats.append(h)
        h = Conv(1, 3, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)
        if self.get_interm_feat:
            return feats
        return h


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGAN pyramid (nets/multi_scale_discriminator.py:9-54).

    Returns a list over scales (full-res first tower applied to the most
    downsampled input, like the reference's reversed indexing); each entry
    is either the patch map or the intermediate-feature list.
    """
    ndf: int = 64
    num_d: int = 3
    use_sigmoid: bool = False
    get_interm_feat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True) -> List:
        results = []
        inp = x
        for i in range(self.num_d):
            tower = NLayerDiscriminator(
                self.ndf, self.use_sigmoid, self.get_interm_feat,
                dtype=self.dtype, name=f"scale{self.num_d - 1 - i}")
            out = tower(inp, train)
            results.append(out if isinstance(out, list) else [out])
            if i != self.num_d - 1:
                inp = avg_pool(inp, (3, 3), (2, 2),
                               padding=((1, 1), (1, 1)),
                               count_include_pad=False)
        return results


class MotionDiscriminator(nn.Module):
    """3-frame motion patch discriminator (nets/motion_discriminator.py:10-29
    active path; the attention machinery there is commented out)."""
    ndf: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = lrelu(bn(Conv(self.ndf, 3, dtype=self.dtype)(x)))
        h = lrelu(bn(Conv(self.ndf, 3, stride=2, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(self.ndf, 3, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(2 * self.ndf, 3, stride=2, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(2 * self.ndf, 3, dtype=self.dtype)(h)))
        h = lrelu(bn(Conv(self.ndf, 3, dtype=self.dtype)(h)))
        return Conv(1, 3, dtype=self.dtype)(h)
