"""Legacy SRN-era refiners (reference nets/SRN.py:14-1375).

This entire file is dead code in the reference — its registry import is
commented out (nets/__init__.py:9-10) — but it documents the lineage that
produced the active refiners: SRN4 -> refine_nets.SRNRefine (our
models/refine.py), AttnRefine V1..V4 -> refine_nets.MSResAttnRefine*
(our models/attn_refine.py).  Implemented here for component-inventory
completeness:

- ``SRN4``/``SRN4Seg``/``SRN4Sharp`` (SRN.py:120-311): scale-recurrent
  encoder-decoder refiners with cross-scale hidden-state recurrence;
  Sharp adds a neighbor-image encoder stream.
- ``HResUnet`` (SRN.py:313-341): shallow high-res refiner fed by the SRN's
  low-res feature.
- ``AttnRefine``/``AttnBaseRefine`` (SRN.py:343-579): single-level 5x5
  patch-correlation attention refiner and its no-attention ablation — the
  attention core reuses ops/corr.py (and through it the Pallas kernel
  lineage).
- ``MSConv2d``/``MSResnetBlock``/``MSBaseRefine`` (SRN.py:1244-1375):
  multi-kernel-size conv refiner.

The AttnRefineV2/V2O/V2Base/V3/V3Base/V4/V4Base iterations are the direct
ancestors of MSResAttnRefineV2/V2Base/V3 and are served by those modules
(models/attn_refine.py) — they are intentionally not duplicated here.
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ResnetBlock,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.corr import (
    window_aggregate,
    window_correlation,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
)

Dtype = Any


class _EncStage(nn.Module):
    """stride-2 conv + N resblocks (SRN.py:28-66)."""
    features: int
    kernel: int = 5
    blocks: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, self.kernel, stride=2, dtype=self.dtype)(x))
        for _ in range(self.blocks):
            x = ResnetBlock(self.features, self.kernel, dtype=self.dtype)(x)
        return x


class _DecStage(nn.Module):
    """N resblocks + 2x transposed conv (SRN.py:68-95)."""
    features: int
    res_kernel: int = 5
    blocks: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.blocks):
            x = ResnetBlock(x.shape[-1], self.res_kernel, dtype=self.dtype)(x)
        return lrelu(ConvT(self.features, dtype=self.dtype)(x))


class _DecOut(nn.Module):
    """3 resblocks + output conv, optional feature tap (SRN.py:98-117)."""
    out_dim: int = 3
    kernel: int = 5
    get_feature: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = ResnetBlock(x.shape[-1], self.kernel, dtype=self.dtype)(x)
        out = Conv(self.out_dim, self.kernel, dtype=self.dtype)(x)
        if self.get_feature:
            return out, x
        return out


class _Head(nn.Module):
    """5x5 conv + 3 resblocks head (SRN.py:125-131)."""
    features: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 5, dtype=self.dtype)(x))
        for _ in range(3):
            x = ResnetBlock(self.features, 5, dtype=self.dtype)(x)
        return x


class SRN4(nn.Module):
    """Scale-recurrent refiner (SRN.py:120-177).

    Call ``(input_rgb[, input_seg, neighbor_imgs])``; returns
    (per-scale preds list, last feature or None, None) like the reference.
    """
    n_scales: int = 1
    with_seg: bool = False
    sharp: bool = False
    high_res: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_rgb, input_seg=None, neighbor_imgs=None,
                 train: bool = True):
        d = self.dtype
        enc1 = _Head(32, dtype=d, name="encoder_1")
        enc2 = _EncStage(64, 5, 3, dtype=d, name="encoder_2")
        enc3 = _EncStage(128, 5, 3, dtype=d, name="encoder_3")
        dec3 = _DecStage(64, 5, 3, dtype=d, name="decoder_3")
        dec2 = _DecStage(32, 5, 3, dtype=d, name="decoder_2")
        dec1 = _DecOut(3, 5, get_feature=self.high_res, dtype=d, name="decoder_1")

        sharp_feats = None
        if self.sharp:
            assert neighbor_imgs is not None
            s1 = _Head(32, dtype=d, name="sharp_encoder_1")(neighbor_imgs)
            s2 = _EncStage(64, 5, 3, dtype=d, name="sharp_encoder_2")(s1)
            sharp_feats = _EncStage(128, 5, 3, dtype=d, name="sharp_encoder_3")(s2)

        preds: List[jnp.ndarray] = []
        hidden = None
        feature = None
        for si in range(self.n_scales - 1, -1, -1):
            scale = 1.0 / (2 ** si)
            x_ori = interpolate_bilinear(
                input_rgb, scale_factor=scale, align_corners=True
            ) if scale != 1.0 else input_rgb
            if preds:
                x_pred = interpolate_bilinear(
                    jax.lax.stop_gradient(preds[-1]), scale_factor=2.0,
                    align_corners=True)
            else:
                x_pred = x_ori
            parts = [x_ori, x_pred]
            if self.with_seg:
                seg_s = interpolate_bilinear(
                    input_seg, scale_factor=scale, align_corners=True
                ) if scale != 1.0 else input_seg
                parts.append(seg_s)
            x = jnp.concatenate(parts, axis=-1)

            e1 = enc1(x)
            e2 = enc2(e1)
            e3 = enc3(e2)
            if self.sharp and sharp_feats is not None:
                sf = interpolate_bilinear(
                    sharp_feats, size=e3.shape[1:3], align_corners=True)
                e3 = e3 + sf
            last_hidden = (
                interpolate_bilinear(hidden, scale_factor=2.0, align_corners=True)
                if hidden is not None and preds else e3)
            h = jnp.concatenate([e3, last_hidden], axis=-1)
            h = lrelu(Conv(128, 3, dtype=d)(h))
            e3 = Conv(128, 3, dtype=d)(h)
            hidden = e3

            d2 = dec3(e3)
            d1 = dec2(e2 + d2)
            out = dec1(e1 + d1)
            if self.high_res:
                out, feature = out
            preds.append(out)
        return preds, feature, None


def SRN4Seg(n_scales: int = 1, dtype=None) -> SRN4:
    return SRN4(n_scales=n_scales, with_seg=True, dtype=dtype)


def SRN4Sharp(n_scales: int = 1, high_res: bool = False, dtype=None) -> SRN4:
    return SRN4(n_scales=n_scales, sharp=True, high_res=high_res, dtype=dtype)


class HResUnet(nn.Module):
    """High-res refiner over the SRN's low feature (SRN.py:313-341)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, refine_out, low_feature, x, train: bool = True):
        h = _Head(32, dtype=self.dtype, name="head")(x)
        e1 = _EncStage(32, 5, 3, dtype=self.dtype, name="encoder_1")(h)
        d1 = _DecStage(32, 5, 3, dtype=self.dtype, name="decoder_1")(
            e1 + low_feature)
        return _DecOut(3, 5, dtype=self.dtype, name="tail")(d1)


class AttnRefine(nn.Module):
    """Single-level 5x5 patch-attention refiner (SRN.py:343-489).

    ``base_only=True`` is AttnBaseRefine (SRN.py:491-579): identical conv
    streams, neighbors summed instead of attention-aggregated.
    """
    base_only: bool = False
    win: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, coarse, seg=None, neighbors=None, train: bool = True):
        d = self.dtype

        # one shared encoder applied to coarse + both neighbors
        # (reference shares conv_encoder_* across all three, SRN.py:411-460)
        c_e1 = Conv(32, 3, dtype=d, name="enc_e1")
        c_e2a = Conv(64, 3, stride=2, dtype=d, name="enc_e2a")
        c_e2b = Conv(64, 3, dtype=d, name="enc_e2b")
        c_e3a = Conv(64, 3, stride=2, dtype=d, name="enc_e3a")
        c_e3b = Conv(64, 3, dtype=d, name="enc_e3b")

        def enc(x):
            h1 = lrelu(c_e1(x))
            h2 = lrelu(c_e2b(lrelu(c_e2a(h1))))
            return c_e3b(lrelu(c_e3a(h2)))

        n1, n2 = neighbors[..., :3], neighbors[..., 3:6]
        q = enc(coarse)
        k1 = enc(n1)
        k2 = enc(n2)

        if self.base_only:
            agg = k1 + k2
        else:
            sim = window_correlation(q, [k1, k2], self.win, self.win)
            prob = jax.nn.softmax(sim, axis=-1)
            agg = window_aggregate([k1, k2], prob, self.win, self.win)

        h = jnp.concatenate([q, agg, k1 + k2], axis=-1)
        h = lrelu(Conv(128, 3, dtype=d)(h))
        h = lrelu(Conv(64, 3, dtype=d)(h))
        h = ResnetBlock(64, dtype=d)(h)
        h = ResnetBlock(64, dtype=d)(h)
        h = interpolate_bilinear(h, scale_factor=2.0, align_corners=True)
        h = lrelu(Conv(64, 3, dtype=d)(h))
        h = lrelu(Conv(64, 3, dtype=d)(h))
        h = interpolate_bilinear(h, scale_factor=2.0, align_corners=True)
        h = lrelu(Conv(32, 3, dtype=d)(h))
        h = lrelu(Conv(32, 3, dtype=d)(h))
        h = ResnetBlock(32, dtype=d)(h)
        return Conv(3, 3, dtype=d)(h)


def AttnBaseRefine(dtype=None) -> AttnRefine:
    return AttnRefine(base_only=True, dtype=dtype)


class MSConv2d(nn.Module):
    """Parallel multi-kernel-size convs, channel-concat (SRN.py:1244-1277)."""
    features: int
    kernels: tuple = (3, 5, 7)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        per = self.features // len(self.kernels)
        outs = []
        rem = self.features
        for i, k in enumerate(self.kernels):
            ch = per if i < len(self.kernels) - 1 else rem
            rem -= ch
            outs.append(Conv(ch, k, dtype=self.dtype)(x))
        return jnp.concatenate(outs, axis=-1)


class MSResnetBlock(nn.Module):
    """MSConv residual block (SRN.py:1279-1290)."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = lrelu(MSConv2d(self.features, dtype=self.dtype)(x))
        h = MSConv2d(self.features, dtype=self.dtype)(h)
        return h + x


class MSBaseRefine(nn.Module):
    """Multi-scale-kernel refiner (SRN.py:1292-1375)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, coarse, seg=None, neighbors=None, train: bool = True):
        d = self.dtype
        parts = [coarse] + ([seg] if seg is not None else []) \
            + ([neighbors] if neighbors is not None else [])
        x = jnp.concatenate(parts, axis=-1)
        h = lrelu(MSConv2d(64, dtype=d)(x))
        h = lrelu(Conv(64, 3, stride=2, dtype=d)(h))
        for _ in range(3):
            h = MSResnetBlock(64, dtype=d)(h)
        h = interpolate_bilinear(h, scale_factor=2.0, align_corners=True)
        h = lrelu(Conv(32, 3, dtype=d)(h))
        return Conv(3, 3, dtype=d)(h)
