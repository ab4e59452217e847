"""Object-track generators (reference nets/TrackGen.py).

The reference crops per-track 64x64 patches and pastes decoded features back
with nested Python loops of variable-size slices (nets/TrackGen.py:128-179,
323-418) — impossible to jit.  Here both directions use the fixed-shape
batched ROI ops (``ops/roi.py``): crops are align_corners=True bilinear
samples on a fixed 64x64 grid, pastes are the inverse bilinear map, both
vectorized over (batch * track).

Box tensor layout matches the data pipeline: (B, 3, N, 4) float
(y1, x1, y2, x2) pixel coords inclusive; frame axis is (for, mid, back).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ConvLReLU,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.roi import (
    crop_resize,
    paste_patches,
)

Dtype = Any
PATCH = 64


class _TrackUNet(nn.Module):
    """Shared patch U-Net (nets/TrackGen.py:13-90)."""
    out_extra: int = 0   # V2 adds 2 location channels
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype

        def trip(ch, stride, name):
            mods = [ConvLReLU(ch, 3, stride=stride, dtype=d, name=f"{name}_0"),
                    ConvLReLU(ch, 3, dtype=d, name=f"{name}_1"),
                    ConvLReLU(ch, 3, dtype=d, name=f"{name}_2")]
            def f(h):
                for m in mods:
                    h = m(h)
                return h
            return f

        e1 = trip(32, 1, "encoder_1")(x)
        e2 = trip(64, 2, "encoder_2")(e1)
        e3 = trip(128, 2, "encoder_3")(e2)
        e4 = trip(128, 2, "encoder_4")(e3)
        b = trip(256, 2, "bottom_layer")(e4)

        h = lrelu(ConvT(128, dtype=d, name="up_4")(b))
        h = trip(128, 1, "decoder_4")(jnp.concatenate([h, e4], axis=-1))
        h = lrelu(ConvT(128, dtype=d, name="up_3")(h))
        h = trip(128, 1, "decoder_3")(jnp.concatenate([h, e3], axis=-1))
        h = lrelu(ConvT(64, dtype=d, name="up_2")(h))
        h = trip(64, 1, "decoder_2")(jnp.concatenate([h, e2], axis=-1))
        h = lrelu(ConvT(32, dtype=d, name="up_1")(h))
        h = jnp.concatenate([h, e1], axis=-1)
        h = ConvLReLU(32, 3, dtype=d, name="decoder_1_0")(h)
        h = ConvLReLU(32, 3, dtype=d, name="decoder_1_1")(h)
        # V1: trailing lrelu conv; V2: linear conv with +2 loc channels
        if self.out_extra:
            h = Conv(32 + self.out_extra, 3, dtype=d, name="decoder_1_2")(h)
        else:
            h = ConvLReLU(32, 3, dtype=d, name="decoder_1_2")(h)
        return h


class _FusionHead(nn.Module):
    """track-fusion + image-fusion + rgb/seg heads (nets/TrackGen.py:94-115)."""
    num_track: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, track_feats, coarse_rgb, coarse_seg, track_mask):
        d = self.dtype
        h = ConvLReLU(128, 3, dtype=d)(track_feats)
        h = ConvLReLU(64, 3, dtype=d)(h)
        h = Conv(32, 3, dtype=d)(h)
        h = jnp.concatenate([h, coarse_rgb, coarse_seg, track_mask], axis=-1)
        for ch in (48, 48, 32, 32, 32):
            h = ConvLReLU(ch, 3, dtype=d)(h)
        rgb = Conv(3, 3, dtype=d, name="rgb_out_1")(ConvLReLU(32, 3, dtype=d, name="rgb_out_0")(h))
        seg = Conv(20, 3, dtype=d, name="seg_out_1")(ConvLReLU(32, 3, dtype=d, name="seg_out_0")(h))
        return rgb, seg


def _box_mask(h: int, w: int, boxes: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 4) -> (B, H, W, 1) union-of-boxes mask."""
    ii = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    jj = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    y1 = boxes[..., 0][:, :, None, None]
    x1 = boxes[..., 1][:, :, None, None]
    y2 = boxes[..., 2][:, :, None, None]
    x2 = boxes[..., 3][:, :, None, None]
    inside = (ii >= y1) & (ii <= y2) & (jj >= x1) & (jj <= x2)
    return jnp.any(inside, axis=1).astype(jnp.float32)[..., None]


def _split_frames(rgb, seg):
    """(B,H,W,6)+(B,H,W,40) -> for/back (rgb+seg 23-ch each)."""
    f = jnp.concatenate([rgb[..., :3], seg[..., :20]], axis=-1)
    b = jnp.concatenate([rgb[..., 3:6], seg[..., 20:40]], axis=-1)
    return f, b


def _crop_tracks(for_img, back_img, boxes):
    """Crop (for, back) patches for every track -> (B, N, 64, 64, 2*C)."""
    fpatch = crop_resize(for_img, boxes[:, 0], (PATCH, PATCH))
    bpatch = crop_resize(back_img, boxes[:, 2], (PATCH, PATCH))
    return jnp.concatenate([fpatch, bpatch], axis=-1)


class TrackGen(nn.Module):
    """Track branch with GT mid-frame boxes (nets/TrackGen.py:8-186).

    Call: ``(rgb(B,H,W,6), seg(B,H,W,40), coarse_rgb, coarse_seg,
    boxes(B,3,N,4))`` -> (rgb_out, seg_out, None, zero-loss).
    """
    num_track: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg, coarse_rgb, coarse_seg, boxes, train: bool = True):
        b, h, w, _ = rgb.shape
        n = self.num_track
        for_img, back_img = _split_frames(rgb, seg)
        patches = _crop_tracks(for_img, back_img, boxes)        # (B,N,64,64,46)
        flat = patches.reshape(b * n, PATCH, PATCH, -1)
        feats = _TrackUNet(dtype=self.dtype, name="unet")(flat)  # (B*N,64,64,32)
        feats = feats.reshape(b, n, PATCH, PATCH, -1)

        mid = boxes[:, 1]                                       # (B,N,4)
        mask = _box_mask(h, w, mid)
        # per-track channels concatenated (reference keeps N*32 channels,
        # nets/TrackGen.py:178); here the paste overwrites into one 32-ch
        # canvas per track then concatenates
        per_track = [
            paste_patches(jnp.zeros((b, h, w, feats.shape[-1]), feats.dtype),
                          feats[:, k:k + 1], mid[:, k:k + 1])
            for k in range(n)
        ]
        track_feats = jnp.concatenate(per_track, axis=-1)
        rgb_out, seg_out = _FusionHead(n, dtype=self.dtype, name="head")(
            track_feats, coarse_rgb, coarse_seg, mask)
        return rgb_out, seg_out, None, jnp.zeros(())


class TrackGenV2(nn.Module):
    """Track branch that *predicts* the mid-frame box (nets/TrackGen.py:192-434).

    Adds normalized coordinate channels to the patch input; the decoder's 2
    extra channels regress a location map whose center/range give the pasted
    box.  Returns (rgb_out, seg_out, gen_boxes, aux_loss) where aux_loss is
    loc_diff (vs GT coord patches) when ``gt_bbox_for_loss`` else loc_range.
    """
    num_track: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, seg, coarse_rgb, coarse_seg, boxes,
                 gt_bbox_for_loss: bool = False, train: bool = True):
        b, h, w, _ = rgb.shape
        n = self.num_track
        # coordinate planes, (h_t, w_t) order (nets/TrackGen.py:307-311)
        ys = jnp.linspace(-1.0, 1.0, h)
        xs = jnp.linspace(-1.0, 1.0, w)
        coord = jnp.stack(
            [jnp.broadcast_to(ys[:, None], (h, w)),
             jnp.broadcast_to(xs[None, :], (h, w))], axis=-1)
        coord = jnp.broadcast_to(coord[None], (b, h, w, 2)).astype(rgb.dtype)

        for_img, back_img = _split_frames(rgb, seg)
        for_img = jnp.concatenate([coord, for_img], axis=-1)
        back_img = jnp.concatenate([coord, back_img], axis=-1)
        patches = _crop_tracks(for_img, back_img, boxes)
        flat = patches.reshape(b * n, PATCH, PATCH, -1)
        out = _TrackUNet(out_extra=2, dtype=self.dtype, name="unet")(flat)

        # location map -> predicted box (nets/TrackGen.py:356-397)
        loc_ori = out[..., :2]                                 # (B*N,64,64,2)
        loc = jnp.clip(loc_ori, -1, 1)
        center = jnp.mean(loc, axis=(1, 2))                    # (B*N, 2) (y, x)
        hmax = jnp.mean(loc[:, -1, :, 0], axis=1)
        hmin = jnp.mean(loc[:, 0, :, 0], axis=1)
        hrange = hmax - hmin
        wmax = jnp.mean(loc[:, :, -1, 1], axis=1)
        wmin = jnp.mean(loc[:, :, 0, 1], axis=1)
        wrange = wmax - wmin
        loc_range_loss = jnp.mean((2 - hrange) + (2 - wrange))
        hrange = jax.nn.relu(hrange)
        wrange = jax.nn.relu(wrange)

        y1 = jnp.clip((center[:, 0] - hrange / 2 + 1) / 2 * h, 0, h - 1)
        y2 = jnp.clip((center[:, 0] + hrange / 2 + 1) / 2 * h, 0, h - 1)
        x1 = jnp.clip((center[:, 1] - wrange / 2 + 1) / 2 * w, 0, w - 1)
        x2 = jnp.clip((center[:, 1] + wrange / 2 + 1) / 2 * w, 0, w - 1)
        gen_boxes = jnp.stack([y1, x1, y2, x2], axis=-1).reshape(b, n, 4)

        feats = out[..., 2:].reshape(b, n, PATCH, PATCH, -1)
        if gt_bbox_for_loss:
            gt_coord = crop_resize(coord, boxes[:, 1], (PATCH, PATCH))
            aux_loss = jnp.mean(jnp.abs(
                gt_coord.reshape(b * n, PATCH, PATCH, 2) - loc_ori))
        else:
            aux_loss = loc_range_loss

        paste_boxes = jax.lax.stop_gradient(gen_boxes)
        mask = _box_mask(h, w, paste_boxes)
        per_track = [
            paste_patches(jnp.zeros((b, h, w, feats.shape[-1]), feats.dtype),
                          feats[:, k:k + 1], paste_boxes[:, k:k + 1])
            for k in range(n)
        ]
        track_feats = jnp.concatenate(per_track, axis=-1)
        rgb_out, seg_out = _FusionHead(n, dtype=self.dtype, name="head")(
            track_feats, coarse_rgb, coarse_seg, mask)
        return rgb_out, seg_out, gen_boxes, aux_loss
