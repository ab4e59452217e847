"""Perceptual losses backed by the frozen feature extractors.

Reference: VGGLoss (losses.py:157-180), VGGCosineLoss (losses.py:182-207),
TrackObjLoss (losses.py:362-414).  The extractor params are frozen pytrees
held outside the optimizer; the factories below close over them and return
pure (pred, gt) -> scalar functions (the reference's ``normed=False`` path:
ImageNet mean/std normalization applied to whatever range the caller
passes, matching utils/net_utils.py:11-23 semantics).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.features import (
    ResNet101Features,
    VGG19Features,
    imagenet_norm,
)
from deep_video_interpolation_extrapolation_tpu.ops.roi import crop_resize


def make_vgg_feature_fn(vgg_module: VGG19Features, vgg_vars) -> Callable:
    def feats(x):
        return vgg_module.apply(vgg_vars, imagenet_norm(x))
    return feats


def make_vgg_l1_loss(vgg_module: VGG19Features, vgg_vars) -> Callable:
    """Mean L1 over 5 feature maps (losses.py:167-180)."""
    feature_fn = make_vgg_feature_fn(vgg_module, vgg_vars)

    def loss(pred, gt):
        fp = feature_fn(pred)
        fg = feature_fn(jax.lax.stop_gradient(gt))
        total = 0.0
        for a, b in zip(fp, fg):
            total = total + jnp.mean(jnp.abs(a - b))
        return total / len(fp)
    return loss


def make_vgg_cosine_score(vgg_module: VGG19Features, vgg_vars) -> Callable:
    """Mean channelwise-cosine over 5 feature maps (losses.py:191-207)."""
    feature_fn = make_vgg_feature_fn(vgg_module, vgg_vars)

    def score(pred, gt):
        fp = feature_fn(pred)
        fg = feature_fn(gt)
        total = 0.0
        for a, b in zip(fp, fg):
            an = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True))
            bn = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True))
            total = total + jnp.mean(jnp.sum(an * bn, axis=-1))
        return total / len(fp)
    return score


def make_track_obj_loss(resnet_module: ResNet101Features, resnet_vars,
                        patch_hw=(64, 128)) -> Callable:
    """Track-consistency cosine loss (losses.py:374-414).

    Crops per-track patches from (for, pred, back) frames at their boxes,
    embeds with frozen ResNet101 layer4 + global pool, and penalizes
    1 - cosine(pred, neighbor).  All crops are fixed-shape ROI gathers.
    """
    h, w = patch_hw

    def loss(pred_img, for_img, back_img, bboxes):
        # bboxes: (B, 3, N, 4) (y1, x1, y2, x2)
        b, _, n, _ = bboxes.shape
        cur = imagenet_norm(pred_img)
        fwd = imagenet_norm(for_img)
        bwd = imagenet_norm(back_img)
        cur_p = crop_resize(cur, bboxes[:, 1], (h, w))
        for_p = crop_resize(fwd, bboxes[:, 0], (h, w))
        back_p = crop_resize(bwd, bboxes[:, 2], (h, w))
        # (B, N, 3, h, w, 3) -> (B*N*3, h, w, 3), order (for, cur, back)
        stack = jnp.stack([for_p, cur_p, back_p], axis=2)
        flat = stack.reshape(b * n * 3, h, w, 3)
        _, _, x5 = resnet_module.apply(resnet_vars, flat, train=False)
        feat = jnp.mean(x5, axis=(1, 2))                      # (B*N*3, 2048)
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        groups = feat.reshape(b * n, 3, -1)
        fwd_s = jnp.sum(groups[:, 0] * groups[:, 1], axis=-1)
        bwd_s = jnp.sum(groups[:, 2] * groups[:, 1], axis=-1)
        return jnp.mean(1.0 - (fwd_s + bwd_s) / 2.0)
    return loss
