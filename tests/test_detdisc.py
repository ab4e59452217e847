"""DetDisc family shape/behavior tests (reference nets/DetDisc.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.models import detdisc as D

B, H, W, T = 2, 32, 32, 4
KEY = jax.random.PRNGKey(0)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    seg = jnp.asarray(np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, H, W))])
    input_x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    input_seg = jnp.asarray(np.concatenate([
        np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, H, W))]
        for _ in range(2)], -1))
    boxes = np.zeros((B, 3, T, 4), np.float32)
    for b in range(B):
        for f in range(3):
            for t in range(T):
                y1, x1 = rng.randint(0, H - 8), rng.randint(0, W - 8)
                boxes[b, f, t] = (y1, x1, y1 + 7, x1 + 7)
    return x, seg, input_x, input_seg, jnp.asarray(boxes)


FRAME_NAMES = ["FrameDetDiscriminator", "FrameSNDetDiscriminator",
               "FrameLSSNDetDiscriminator"]
VIDEO_NAMES = ["VideoDetDiscriminator", "VideoSNDetDiscriminator",
               "VideoLSSNDetDiscriminator", "VideoVecSNDetDiscriminator",
               "VideoPoolSNDetDiscriminator",
               "VideoGlobalZeroSNDetDiscriminator",
               "VideoGlobalMaskSNDetDiscriminator",
               "VideoGlobalCoordSNDetDiscriminator",
               "VideoGlobalResSNDetDiscriminator",
               "VideoLocalPatchSNDetDiscriminator"]


@pytest.mark.parametrize("name", FRAME_NAMES)
def test_frame_variants(name):
    x, seg, _, _, boxes = _inputs()
    m = getattr(D, name)(seg_disc=True, dtype=jnp.float32)
    v = m.init(KEY, x, seg, bboxes=boxes, train=False)
    out = m.apply(v, x, seg, bboxes=boxes, train=False)
    assert out.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", VIDEO_NAMES)
def test_video_variants(name):
    x, seg, input_x, input_seg, boxes = _inputs()
    m = getattr(D, name)(seg_disc=True, dtype=jnp.float32)
    v = m.init(KEY, x, seg, input_x, input_seg, bboxes=boxes, train=False)
    out = m.apply(v, x, seg, input_x, input_seg, bboxes=boxes, train=False)
    assert out.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_sync_neg_changes_score():
    x, seg, input_x, input_seg, boxes = _inputs()
    m = D.VideoSNDetDiscriminator(seg_disc=False, dtype=jnp.float32)
    v = m.init(KEY, x, seg, input_x, input_seg, bboxes=boxes, train=False)
    pos = m.apply(v, x, seg, input_x, input_seg, bboxes=boxes, train=False)
    neg = m.apply(v, x, seg, input_x, input_seg, bboxes=boxes, sync_neg=True,
                  train=False, rngs={"sync_neg": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(pos), np.asarray(neg))


def test_five_field_boxes_weighting():
    x, seg, input_x, input_seg, boxes = _inputs()
    scores = jnp.asarray(
        np.random.RandomState(3).uniform(0.5, 1.0, (B, 3, T, 1)), jnp.float32)
    boxes5 = jnp.concatenate([scores, boxes], axis=-1)
    m = D.VideoLSSNDetDiscriminator(seg_disc=False, dtype=jnp.float32)
    v = m.init(KEY, x, seg, input_x, input_seg, bboxes=boxes5, train=False)
    out = m.apply(v, x, seg, input_x, input_seg, bboxes=boxes5, train=False)
    assert out.shape == (B,) and np.all(np.isfinite(np.asarray(out)))
