"""Weighted RGB loss bundle (reference ``RGBLoss``, losses.py:213-241).

Returns the same ordered key set ('{prefix}_l1_loss', '_gdl_loss',
'_vgg_loss', '_ssim_loss') with the same weighting so training logs are
comparable line-for-line with the reference.  The VGG term is injected as a
callable (set ``vgg_fn=None`` to drop it, e.g. in unit tests) to keep this a
pure function of arrays.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Optional

import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.losses.image import (
    gdl_loss,
    l1_loss,
    ssim_loss,
)


def rgb_loss_bundle(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    l1_w: float,
    gdl_w: float,
    vgg_w: float,
    ssim_w: float,
    vgg_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    prefix: str = "",
) -> "OrderedDict[str, jnp.ndarray]":
    """pred/gt are NHWC in [-1, 1] (the runners pass normed=False so VGG
    preprocessing happens inside the VGG term; reference losses.py:223-241)."""
    out = OrderedDict()
    out[f"{prefix}_l1_loss"] = l1_w * l1_loss(pred, gt)
    out[f"{prefix}_gdl_loss"] = gdl_w * gdl_loss(pred, gt)
    if vgg_fn is not None:
        out[f"{prefix}_vgg_loss"] = vgg_w * vgg_fn(pred, gt)
    else:
        out[f"{prefix}_vgg_loss"] = jnp.zeros(())
    out[f"{prefix}_ssim_loss"] = ssim_w * ssim_loss(pred, gt)
    return out
