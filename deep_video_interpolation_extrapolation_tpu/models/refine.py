"""SRN-style multi-scale refinement network (reference nets/refine_nets.py:27-135).

Scale-recurrent refiner: runs coarsest-to-finest, feeding each scale's
(detached, 2x-upsampled) prediction and hidden bottleneck state into the
next.  The scale loop is a static Python loop (n_scales is a config
constant), so XLA sees one fused graph; weights are shared across scales
like the reference (one set of layers reused per scale).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ConvLReLU,
    ResnetBlock,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import interpolate_bilinear

Dtype = Any


class _SRNCore(nn.Module):
    """One scale pass; weights shared across scales by the caller."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, last_hidden):
        # input layer: 3 convs + 3 resblocks -> 64 (refine_nets.py:33-43)
        h = ConvLReLU(32, 3, dtype=self.dtype)(x)
        h = ConvLReLU(32, 3, dtype=self.dtype)(h)
        h = ConvLReLU(64, 3, dtype=self.dtype)(h)
        for _ in range(3):
            h = ResnetBlock(64, dtype=self.dtype)(h)
        in_out = h

        e1 = ConvLReLU(128, 3, stride=2, dtype=self.dtype)(in_out)
        for _ in range(3):
            e1 = ResnetBlock(128, dtype=self.dtype)(e1)
        e2 = ConvLReLU(256, 3, stride=2, dtype=self.dtype)(e1)
        for _ in range(3):
            e2 = ResnetBlock(256, dtype=self.dtype)(e2)

        b = e2
        for rate in (1, 2, 4, 8):
            b = ConvLReLU(256, 3, dilation=rate, dtype=self.dtype)(b)

        hidden = b if last_hidden is None else last_hidden
        hc = jnp.concatenate([b, hidden], axis=-1)
        hc = ConvLReLU(256, 3, dtype=self.dtype)(hc)
        hc = ConvLReLU(256, 3, dtype=self.dtype)(hc)
        new_hidden = hc

        d2 = hc + e2
        for _ in range(3):
            d2 = ResnetBlock(256, dtype=self.dtype)(d2)
        d2 = lrelu(ConvT(128, dtype=self.dtype)(d2))
        d1 = d2 + e1
        for _ in range(3):
            d1 = ResnetBlock(128, dtype=self.dtype)(d1)
        d1 = lrelu(ConvT(64, dtype=self.dtype)(d1))

        o = d1 + in_out
        for _ in range(3):
            o = ResnetBlock(64, dtype=self.dtype)(o)
        o = ConvLReLU(32, 3, dtype=self.dtype)(o)
        pred = Conv(3, 3, dtype=self.dtype)(o)
        return pred, new_hidden


class SRNRefine(nn.Module):
    """Multi-scale refine (refine_nets.py:102-135).

    Call: ``(coarse_rgb, coarse_seg_soft, encoded_feat)`` — (B,H,W,3),
    (B,H,W,20), (B,H,W,14).  Returns list of per-scale predictions,
    coarsest first, finest (full-res) last.

    seg/feat are optional, mirroring the reference's ``input_seg=None``
    default (nets/SRN.py:204) — the legacy RefineGAN head calls its
    refiner with only the detached coarse rgb.
    """
    n_scales: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_rgb, input_seg=None, encoded_feat=None,
                 train: bool = True) -> List[jnp.ndarray]:
        core = _SRNCore(dtype=self.dtype, name="core")
        extra = [t for t in (input_seg, encoded_feat) if t is not None]
        others = jnp.concatenate(extra, axis=-1) if extra else None
        preds: List[jnp.ndarray] = []
        hidden = None
        for scale_idx in range(self.n_scales - 1, -1, -1):
            scale = 1.0 / (2 ** scale_idx)
            ori = interpolate_bilinear(input_rgb, scale_factor=scale, align_corners=True) \
                if scale != 1.0 else input_rgb
            if preds:
                prev = jax.lax.stop_gradient(preds[-1])
                pred_in = interpolate_bilinear(prev, scale_factor=2.0, align_corners=True)
            else:
                pred_in = ori
            parts = [ori, pred_in]
            if others is not None:
                parts.append(
                    interpolate_bilinear(others, scale_factor=scale,
                                         align_corners=True)
                    if scale != 1.0 else others)
            x = jnp.concatenate(parts, axis=-1)
            if hidden is not None:
                hidden = interpolate_bilinear(hidden, scale_factor=2.0, align_corners=True)
            pred, hidden = core(x, hidden)
            preds.append(pred)
        return preds
