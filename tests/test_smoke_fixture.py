"""Offline-builder -> dataset-factory chain on a fake-Cityscapes tree.

tools_smoke_e2e.py drives the full CLI on the real device; this test
pins the CI-speed part of that chain: build_clips' pkl grammar must be
exactly what data/datasets.clip_file_path derives and ClipDataset must
load the resulting tree through the Loader (reference chain
create_vid_file.py -> data.py:21-74 -> folder.py:76-313).
"""

import os

import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data import datasets


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_cityscape")
    from tools_smoke_e2e import build_fixture
    fix = build_fixture(str(root), n_vids=1, clip_len=10, src=40,
                        interval=2)
    return str(root), fix


def _cfg(fix, split, interval=2):
    return Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        dataset="cityscape", split=split, input_h=32, input_w=32,
        batch_size=2, interval=interval, num_track_per_img=4,
        img_dir=fix["img_dir"], seg_dir=fix["seg_dir"], num_workers=0,
    )


def test_builder_pkl_matches_factory_naming(fixture_root, monkeypatch):
    root, fix = fixture_root
    monkeypatch.setenv("DVIE_DATA_ROOT", root)
    cfg = _cfg(fix, "train")
    # the factory must find the pkl the builder wrote — name derivation
    # is the contract (data.py:25-32 grammar)
    assert os.path.exists(datasets.clip_file_path(cfg))
    train, val = datasets.get_dataset(cfg)
    assert val is None and len(train) == fix["n_train_clips"] > 0


def test_loader_batches_from_built_tree(fixture_root, monkeypatch):
    root, fix = fixture_root
    monkeypatch.setenv("DVIE_DATA_ROOT", root)
    cfg = _cfg(fix, "train")
    train, _ = datasets.get_dataset(cfg)
    loader = datasets.make_loader(cfg, train)
    batch = next(iter(loader))
    assert batch["frame1"].shape == (2, 32, 32, 3)
    assert batch["frame2"].shape == (2, 32, 32, 3)
    # uint8 seg ids (the device contract) in [0, 20)
    for k in ("seg1", "seg2", "seg3"):
        assert batch[k].dtype == np.uint8 and batch[k].max() < 20
    # frames normalized to [-1, 1]
    assert -1.0 <= float(batch["frame1"].min()) <= float(
        batch["frame1"].max()) <= 1.0


def test_val_split_loads(fixture_root, monkeypatch):
    root, fix = fixture_root
    monkeypatch.setenv("DVIE_DATA_ROOT", root)
    cfg = _cfg(fix, "val")
    _, val = datasets.get_dataset(cfg)
    assert val is not None and len(val) == fix["n_val_clips"] > 0
    loader = datasets.make_loader(cfg, val)
    n = sum(b["frame1"].shape[0] for b in loader)
    assert n == len(val)  # eval keeps the tail batch
