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


class TestWorkerLoader:
    def test_workers_match_sequential(self, tmp_path):
        """num_workers > 0 yields bit-identical batches to the sequential
        path (per-sample RNG seeding is thread-timing independent)."""
        img_dir, seg_dir, clips = _make_cityscape_tree(tmp_path, n_clips=4)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        seq = Loader(ds, batch_size=2, seed=3, num_workers=0)
        par = Loader(ds, batch_size=2, seed=3, num_workers=4)
        seq.set_epoch(2)
        par.set_epoch(2)
        a = list(seq)
        b = list(par)
        assert len(a) == len(b) == len(seq)
        for x, y in zip(a, b):
            assert sorted(x) == sorted(y)
            for k in x:
                np.testing.assert_array_equal(x[k], y[k])

    def test_workers_overlap_decode(self):
        """With a slow sample() the worker loader overlaps decode work
        (the reference's DataLoader(num_workers=args.nw) purpose,
        InterTrainer.py:84-87): 4 workers on a 50 ms/sample dataset beat
        the sequential loader by >2x."""
        import time as _time

        class SlowDS:
            def __len__(self):
                return 16

            def sample(self, i, rng):
                _time.sleep(0.05)
                return {"x": np.full((4,), i, np.float32)}

        seq = Loader(SlowDS(), batch_size=4, num_workers=0, shuffle=False)
        par = Loader(SlowDS(), batch_size=4, num_workers=4, shuffle=False)
        t0 = _time.time()
        a = list(seq)
        t_seq = _time.time() - t0
        t0 = _time.time()
        b = list(par)
        t_par = _time.time() - t0
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["x"], y["x"])
        assert t_par < t_seq / 2, (t_par, t_seq)

    def test_worker_loader_propagates_errors(self):
        class BadDS:
            def __len__(self):
                return 8

            def sample(self, i, rng):
                if i == 5:
                    raise ValueError("boom")
                return {"x": np.zeros((2,), np.float32)}

        par = Loader(BadDS(), batch_size=2, num_workers=2, shuffle=False)
        with pytest.raises(ValueError, match="boom"):
            list(par)

    def test_worker_loader_early_abandon(self):
        """Dropping the iterator mid-epoch must not deadlock OR strand the
        producer: the terminal queue puts must respect the stop event (an
        unguarded q.put(None) used to block forever on a full queue,
        leaking the thread and its decoded batches)."""
        import threading
        import time as _time

        class DS:
            def __len__(self):
                return 64

            def sample(self, i, rng):
                return {"x": np.zeros((2,), np.float32)}

        before = set(threading.enumerate())
        par = Loader(DS(), batch_size=2, num_workers=2, shuffle=False,
                     prefetch=1)  # tiny queue: guarantees it is full
        it = iter(par)
        next(it)
        it.close()  # triggers the finally/stop path
        deadline = _time.time() + 10
        while _time.time() < deadline:
            leaked = [t for t in set(threading.enumerate()) - before
                      if t.is_alive()]
            if not leaked:
                break
            _time.sleep(0.1)
        assert not leaked, f"loader threads still alive: {leaked}"


class TestLoaderTail:
    def test_val_loader_keeps_tail_batch(self):
        """Eval loaders must not drop the last partial batch (torch
        DataLoader drop_last defaults False); dropping it silently
        truncated val metrics.  Train keeps drop_last=True (fixed step
        shape; documented deviation)."""
        class DS:
            def __len__(self):
                return 5

            def sample(self, i, rng):
                return {"x": np.full((2,), i, np.float32)}

        val_cfg = _cfg(split="val")
        val_cfg = val_cfg.replace(batch_size=2)
        loader = data_lib.make_loader(val_cfg, DS())
        batches = list(loader)
        assert [b["x"].shape[0] for b in batches] == [2, 2, 1]
        assert len(loader) == 3

        train_cfg = _cfg(split="train").replace(batch_size=2)
        loader_t = data_lib.make_loader(train_cfg, DS())
        assert len(loader_t) == 2
        assert all(b["x"].shape[0] == 2 for b in loader_t)


class TestTrackScarcity:
    def test_fewer_tracks_than_requested_duplicates(self, tmp_path):
        """bbox pkls keep clips with >= 1 passing track, never padded to
        num_track_per_img; the sampler must duplicate, not IndexError."""
        img_dir, seg_dir, clips = _make_cityscape_tree(tmp_path, n_clips=1)
        cfg = _cfg(split="train")
        cfg = cfg.replace(num_track_per_img=4)
        # one track only, full-frame box at the pkl's 1024x512 scale
        boxes = [[[[0.9, 8.0, 8.0, 1000.0, 500.0]]] * 3]
        ds = ClipDataset(cfg, clips[:1], split="train", img_dir=img_dir,
                         seg_dir=seg_dir, bboxes=boxes)
        s = ds.sample(0, np.random.RandomState(0))
        assert s["bboxes"].shape == (3, 4, 4)
        # the single valid track was duplicated into all 4 slots
        assert np.allclose(s["bboxes"][1][0], s["bboxes"][1][1])


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
