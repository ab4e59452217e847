"""GAN observability panel (InterGANTrainer.py:189-259): bbox-overlay row,
local-discriminator heatmap row (--local_disc), nrow=4 grid layout, plus
the draw_bbox/prob_heatmap primitives."""

import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.utils.vis import (
    draw_bbox,
    make_grid,
    prob_heatmap,
)


def test_draw_bbox_marks_edges():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_bbox(img, np.array([[4, 6, 20, 28]], np.float32))
    assert out[4, 10].sum() > 0          # top edge colored
    assert out[20, 10].sum() > 0         # bottom edge
    assert out[10, 6].sum() > 0          # left edge
    assert out[12, 16].sum() == 0        # interior untouched
    np.testing.assert_array_equal(img, 0)  # input not mutated


def test_prob_heatmap_colormap():
    """InterGANTrainer.py:168-179: p=0 -> red, p=0.5 -> blue, p=1 -> green."""
    hm = prob_heatmap(np.array([[0.0, 0.5, 1.0]], np.float32))
    np.testing.assert_allclose(hm[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hm[0, 1], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(hm[0, 2], [0, 1, 0], atol=1e-6)


def test_make_grid_nrow():
    imgs = [np.full((8, 16, 3), i / 10, np.float32) for i in range(8)]
    g = make_grid(imgs, pad=2, nrow=4)
    assert g.shape[0] == 3
    assert g.shape[1] == 2 * 8 + 2       # two rows + padding
    assert g.shape[2] == 4 * 16 + 3 * 2  # four columns + padding


class _FakeWriter:
    def __init__(self):
        self.images = {}

    def add_image(self, tag, img, step):
        self.images[tag] = (np.asarray(img), step)


def test_gan_panel_rows(tmp_path):
    """The panel contains rgb + bbox + seg + heatmap rows when local
    discriminators and a det family are active, consuming --local_disc."""
    from deep_video_interpolation_extrapolation_tpu.train.runner import Runner

    cfg = Config(
        runner="INTER", model="InterGANNet", syn_type="inter", mode="xs2xs",
        coarse_model="VAEHRNet", vae=True, gan=True, seg_disc=True,
        frame_disc=True, frame_disc_model="FrameLocalDiscriminator",
        video_disc=True, video_disc_model="VideoLocalDiscriminator",
        frame_det_disc=True, frame_det_disc_model="FrameLocalDiscriminator",
        local_disc=True, train_coarse=True, split="train",
        compute_dtype="float32", input_h=32, input_w=64, batch_size=1,
        dataset="synthetic", num_track_per_img=4)
    runner = Runner(cfg, str(tmp_path))
    runner.writer = _FakeWriter()
    batch = runner._sample_batch()
    runner._log_gan_images(batch, step=0)
    img, step = runner.writer.images["train/gan_panel"]
    assert step == 0 and img.ndim == 3 and img.shape[0] == 3
    h, w = 32, 64
    pad = 2
    # 4 rows of 4 tiles: rgb, bbox overlays, seg vis, local-disc heatmaps
    assert img.shape[1] == 4 * h + 3 * pad
    assert img.shape[2] == 4 * w + 3 * pad
