"""Dataset factory (reference data.py:21-143).

Replicates the reference's split selection: pickled clip lists keyed by
interval/track-count/area (data.py:25-32), bbox coordinate pickles, and
per-split source dirs.  The reference hard-codes ``/data/linz/...`` roots;
here the root comes from ``--img_dir/--seg_dir`` or ``$DVIE_DATA_ROOT``,
with the same relative naming convention.  ``--dataset synthetic`` (a
TPU-framework addition) provides generated clips so every pipeline stage
runs without the Cityscapes download.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data.folder import ClipDataset, Loader
from deep_video_interpolation_extrapolation_tpu.data.synthetic import (
    SyntheticClipDataset,
)


def data_root() -> str:
    return os.environ.get("DVIE_DATA_ROOT", "/data/cityscape")


def clip_file_path(cfg: Config) -> str:
    """Mirror of the reference's clip-pkl naming (data.py:25-32)."""
    root = data_root()
    if cfg.effec_flow:
        return os.path.join(
            root, "load_files",
            f"effec_flow_int_{int(cfg.interval)}_len_3_extra_lsclip.pkl")
    if cfg.syn_type == "extra" and cfg.vid_length != 1:
        return os.path.join(
            root, "load_files",
            f"int_{int(cfg.interval)}_len_{cfg.vid_length + 2}_extra_lsclip.pkl")
    return os.path.join(
        root, "load_files",
        f"int_{int(cfg.interval)}_len_3_max_{int(cfg.num_track_per_img)}bb_"
        f"area_3000_extra_panet_lsclip.pkl")


def obj_coord_file_path(cfg: Config) -> str:
    return os.path.join(
        data_root(), "obj_coords",
        f"int_{int(cfg.interval)}_len_3_extra_512x1024_max_"
        f"{int(cfg.num_track_per_img)}bb_area_3000_panet_lsclip.pkl")


def get_dataset(cfg: Config, vid_len: int = 3):
    """Returns (train_dataset, val_dataset); each may be None per split."""
    if cfg.dataset == "synthetic":
        bs = cfg.batch_size
        train = SyntheticClipDataset(cfg, bs, num_batches=8, vid_len=vid_len)
        val = SyntheticClipDataset(cfg, bs, num_batches=4, vid_len=vid_len)
        return (train if cfg.split == "train" else None,
                val if cfg.split == "val" else None)

    if cfg.dataset == "cityscape":
        with open(clip_file_path(cfg), "rb") as f:
            clips = pickle.load(f)
        boxes = None
        coord_path = obj_coord_file_path(cfg)
        if os.path.exists(coord_path):
            with open(coord_path, "rb") as f:
                boxes = pickle.load(f)
        # ship uint8 seg ids to the device and one-hot inside the jitted
        # step (seg_oh) — 80x less seg transfer than the reference's f32
        # one-hot contract; DVIE_SEG_IDS=0 restores host-side one-hot
        seg_ids = os.environ.get("DVIE_SEG_IDS", "1") != "0"
        train = val = None
        if cfg.split == "train":
            train = ClipDataset(
                cfg, clips["train"],
                bboxes=boxes["train"] if boxes else None, split="train",
                seg_ids=seg_ids)
        if cfg.split == "val":
            val = ClipDataset(
                cfg, clips["val"],
                bboxes=boxes["val"] if boxes else None, split="val",
                seg_ids=seg_ids)
        return train, val

    if cfg.dataset == "ucf101":
        # val-only xx2x triplets from a pickled clip list (data.py:75-93)
        from deep_video_interpolation_extrapolation_tpu.data.folder import (
            TripletDataset,
        )
        root = cfg.img_dir or os.path.join(data_root(), "ucf101_interp_ours")
        clip_path = os.path.join(
            os.path.dirname(root.rstrip("/")), "UCF101_test_root_clip.pkl")
        with open(clip_path, "rb") as f:
            clips = pickle.load(f)["test"]
        val = TripletDataset(cfg, clips, root, style="ucf101",
                             resize=(256, 256))
        return None, val

    if cfg.dataset == "vimeo":
        # tri_trainlist/tri_testlist of triplet dirs (data.py:95-137)
        from deep_video_interpolation_extrapolation_tpu.data.folder import (
            TripletDataset,
        )
        root = cfg.img_dir or os.path.join(data_root(), "vimeo_triplet")
        seq_dir = os.path.join(root, "sequences")

        def read_list(name):
            rows = []
            with open(os.path.join(root, name)) as f:
                for line in f:
                    line = line.strip()
                    if len(line) < 4:
                        break
                    rows.append(line)
            return rows

        train = val = None
        if cfg.split == "train":
            train = TripletDataset(cfg, read_list("tri_trainlist.txt"), seq_dir)
        if cfg.split == "val":
            val = TripletDataset(cfg, read_list("tri_testlist.txt"), seq_dir)
        return train, val
    raise KeyError(cfg.dataset)


def make_loader(cfg: Config, dataset, shuffle: Optional[bool] = None):
    if isinstance(dataset, SyntheticClipDataset):
        return dataset
    is_train = shuffle if shuffle is not None else (cfg.split == "train")
    # eval keeps the tail batch (torch DataLoader drop_last defaults False;
    # dropping it silently truncated val metrics vs the reference's
    # full-set numbers).  Train drops it — a fixed step shape avoids a
    # tail-shape retrace of the jitted train step (documented deviation).
    return Loader(
        dataset, cfg.batch_size, seed=cfg.seed,
        shuffle=is_train, drop_last=is_train,
        num_workers=cfg.num_workers)
