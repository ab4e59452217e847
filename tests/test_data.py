"""Data pipeline tests: Cityscapes clip sampler semantics, triplet datasets,
loader determinism."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data import datasets as data_lib
from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
    IMG_EXT,
    SEG_EXT,
)
from deep_video_interpolation_extrapolation_tpu.data.folder import (
    ClipDataset,
    Loader,
    TripletDataset,
    correlated_crop_params,
)
from deep_video_interpolation_extrapolation_tpu.data.synthetic import (
    SyntheticClipDataset,
)


def _cfg(**kw):
    base = dict(runner="INTER", model="InterNet", syn_type="inter",
                mode="xs2xs", input_h=128, input_w=128, batch_size=2,
                dataset="cityscape", num_track_per_img=4)
    base.update(kw)
    return Config(**base)


def _make_cityscape_tree(tmp_path, n_clips=3, src=150):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    seg_dir = tmp_path / "segs"
    clips = []
    for c in range(n_clips):
        clip = []
        for i in range(3):
            rel = f"train/scene/clip{c}_{i:06d}"
            clip.append(rel)
            for d, ext, mkarr in (
                (img_dir, IMG_EXT,
                 lambda: rng.randint(0, 255, (src, src, 3), dtype=np.uint8)),
                (seg_dir, SEG_EXT,
                 lambda: rng.randint(0, 20, (src, src)).astype(np.uint8)),
            ):
                p = d / (rel + ext)
                p.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(mkarr()).save(p)
        clips.append(clip)
    return str(img_dir), str(seg_dir), clips


class TestClipDataset:
    def test_train_sample_shapes(self, tmp_path):
        img_dir, seg_dir, clips = _make_cityscape_tree(tmp_path)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        s = ds.sample(0, np.random.RandomState(0))
        assert s["frame1"].shape == (128, 128, 3)
        assert s["seg1"].shape == (128, 128, 20)
        assert s["bboxes"].shape == (3, 4, 4)
        # rgb normalized to [-1, 1]
        assert s["frame1"].min() >= -1.0 and s["frame1"].max() <= 1.0
        # one-hot segs
        assert np.allclose(s["seg2"].sum(-1), 1.0)

    def test_correlated_crops_drift_linearly(self):
        rng = np.random.RandomState(3)
        for _ in range(20):
            f, m, l = correlated_crop_params(rng, 150, 128)
            assert 0 <= f <= 22 and 0 <= m <= 22 and 0 <= l <= 22
            # linear drift: middle is the average (rounded)
            assert abs((f + l) / 2 - m) <= 1

    def test_loader_epoch_determinism(self, tmp_path):
        img_dir, seg_dir, clips = _make_cityscape_tree(tmp_path)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        loader = Loader(ds, batch_size=2, seed=7)
        loader.set_epoch(1)
        a = [b["frame1"].copy() for b in loader]
        loader.set_epoch(1)
        b = [b["frame1"].copy() for b in loader]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        loader.set_epoch(2)
        c = [b["frame1"].copy() for b in loader]
        assert not all(np.array_equal(x, y) for x, y in zip(a, c))


class TestTripletDatasets:
    def test_vimeo_layout(self, tmp_path):
        seq = tmp_path / "sequences" / "00001" / "0266"
        seq.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (64, 112, 3), dtype=np.uint8)
                            ).save(seq / f"im{i + 1}.png")
        cfg = _cfg(dataset="vimeo", mode="xx2x")
        ds = TripletDataset(cfg, ["00001/0266"], str(tmp_path / "sequences"))
        s = ds.sample(0, rng)
        assert s["frame1"].shape == (64, 112, 3)
        assert s["seg1"].shape == (64, 112, 20)
        assert np.all(s["seg1"] == 0)

    def test_get_dataset_vimeo(self, tmp_path):
        (tmp_path / "sequences" / "00001" / "0266").mkdir(parents=True)
        for i in range(3):
            Image.new("RGB", (16, 16)).save(
                tmp_path / "sequences" / "00001" / "0266" / f"im{i + 1}.png")
        (tmp_path / "tri_testlist.txt").write_text("00001/0266\n\n")
        cfg = _cfg(dataset="vimeo", mode="xx2x", split="val",
                   img_dir=str(tmp_path))
        _, val = data_lib.get_dataset(cfg)
        assert len(val) == 1
        s = val.sample(0, np.random.RandomState(0))
        assert s["frame2"].shape == (16, 16, 3)


class TestSynthetic:
    def test_batch_structure(self):
        cfg = _cfg(dataset="synthetic", input_h=16, input_w=32)
        ds = SyntheticClipDataset(cfg, batch_size=2, num_batches=2)
        batches = list(ds)
        assert len(batches) == 2
        b = batches[0]
        assert b["frame1"].shape == (2, 16, 32, 3)
        assert b["bboxes"].shape == (2, 3, 4, 4)
        # deterministic per epoch
        ds.set_epoch(0)
        again = list(ds)[0]
        np.testing.assert_array_equal(b["frame1"], again["frame1"])
