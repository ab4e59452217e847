"""Image-grid helpers for TensorBoard logging (reference
runners/InterTrainer.py:499-513 image grids, utils/net_utils.py:57-70
seg visualization)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
    vis_seg_ids,
)


def to01(img: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] clipped."""
    return np.clip((np.asarray(img, np.float32) + 1.0) / 2.0, 0.0, 1.0)


def seg_to_rgb(seg_logits_or_onehot: np.ndarray) -> np.ndarray:
    """(H,W,20) -> (H,W,3) float [0,1] color map."""
    ids = np.argmax(np.asarray(seg_logits_or_onehot), axis=-1)
    return vis_seg_ids(ids).astype(np.float32)


def make_grid(images: Sequence[np.ndarray], pad: int = 2) -> np.ndarray:
    """Horizontally tile same-height HWC [0,1] images -> CHW for
    tensorboardX ``add_image``."""
    h = max(im.shape[0] for im in images)
    parts = []
    for im in images:
        im = np.asarray(im, np.float32)
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        if im.shape[0] != h:
            reps = h // im.shape[0]
            im = np.repeat(np.repeat(im, reps, 0), reps, 1)
        parts.append(im)
        parts.append(np.ones((h, pad, 3), np.float32))
    grid = np.concatenate(parts[:-1], axis=1)
    return np.transpose(grid, (2, 0, 1))
