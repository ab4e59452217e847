"""Offline tooling + flow visualization + SRN legacy tests."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from deep_video_interpolation_extrapolation_tpu.models import srn_legacy as S
from deep_video_interpolation_extrapolation_tpu.tools import build_clips, video_tools
from deep_video_interpolation_extrapolation_tpu.utils.flow_vis import (
    flow_to_image,
    make_color_wheel,
)

KEY = jax.random.PRNGKey(0)


class TestClipBuilders:
    def _root(self, tmp_path):
        # fake root clip pkl: 1 clip of 30 frames
        clips = {"train": [[f"train/scene/f_{i:06d}" for i in range(30)]],
                 "val": []}
        p = tmp_path / "root_clip.pkl"
        with open(p, "wb") as f:
            pickle.dump(clips, f)
        return str(p)

    def test_pred_lsclip(self, tmp_path):
        root = self._root(tmp_path)
        out = build_clips.create_pred_lsclip(
            root, str(tmp_path / "o.pkl"), interval=5, vid_len=3)
        # windows: i in [0, 30 - 10) => 20 clips
        assert len(out["train"]) == 20
        first = out["train"][0]
        assert first == ["train/scene/f_000000", "train/scene/f_000005",
                         "train/scene/f_000010"]

    def test_interp_lsclip_order(self, tmp_path):
        root = self._root(tmp_path)
        out = build_clips.create_interp_lsclip(
            root, str(tmp_path / "o.pkl"), interval=5)
        first = out["train"][0]
        # (first, last, middle) — reference create_vid_file.py:182
        assert first == ["train/scene/f_000000", "train/scene/f_000010",
                         "train/scene/f_000005"]

    def test_root_clip_builder(self, tmp_path):
        d = tmp_path / "imgs" / "train" / "aachen"
        d.mkdir(parents=True)
        for i in range(30):
            Image.new("RGB", (4, 4)).save(
                d / f"aachen_000000_{i:06d}_leftImg8bit.png")
        out = build_clips.create_root_clip(
            str(tmp_path / "imgs"), str(tmp_path / "root.pkl"),
            scene_dict={"train": ["aachen"]})
        assert len(out["train"]) == 1 and len(out["train"][0]) == 30

    def test_clean_bbox_max(self, tmp_path):
        rng = np.random.RandomState(0)
        boxes = rng.uniform(0, 1, (3, 6, 5)).astype(np.float32)
        boxes[..., 3:] = boxes[..., 1:3] + 20  # decent areas
        clips = {"train": [["a", "b", "c"]]}
        bb = {"train": [boxes]}
        with open(tmp_path / "bb.pkl", "wb") as f:
            pickle.dump(bb, f)
        with open(tmp_path / "cl.pkl", "wb") as f:
            pickle.dump(clips, f)
        build_clips.clean_bbox_file_max(
            str(tmp_path / "bb.pkl"), str(tmp_path / "cl.pkl"),
            str(tmp_path / "bb2.pkl"), str(tmp_path / "cl2.pkl"),
            num_box=4, area_thresh=1.0)
        with open(tmp_path / "bb2.pkl", "rb") as f:
            nb = pickle.load(f)
        assert nb["train"][0].shape == (3, 4, 5)


class TestVideoTools:
    def test_resize_and_vid(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        for i in range(4):
            Image.fromarray(
                (np.random.RandomState(i).uniform(0, 255, (16, 16, 3))
                 ).astype(np.uint8)).save(src / f"{i:03d}.png")
        n = video_tools.resize_images(str(src), str(tmp_path / "dst"), (8, 8))
        assert n == 4
        assert np.asarray(Image.open(tmp_path / "dst" / "000.png")).shape == (8, 8, 3)
        m = video_tools.imgs2vid(str(tmp_path / "dst"), str(tmp_path / "v.avi"))
        assert m == 4 and os.path.getsize(tmp_path / "v.avi") > 0

    def test_combine_grids(self, tmp_path):
        for d in ("a", "b"):
            (tmp_path / d).mkdir()
            for i in range(2):
                Image.new("RGB", (8, 8)).save(tmp_path / d / f"{i}.png")
        n = video_tools.combine_grids(
            [str(tmp_path / "a"), str(tmp_path / "b")],
            str(tmp_path / "g.avi"))
        assert n == 2

    def test_assemble_cycgen_videos(self, tmp_path):
        clip = tmp_path / "clip_00000"
        for sub in ("rgb", "seg_vis"):
            (clip / sub).mkdir(parents=True)
            for i in range(3):
                Image.new("RGB", (8, 8)).save(clip / sub / f"{i:03d}.png")
        n = video_tools.assemble_cycgen_videos(str(tmp_path))
        assert n == 1 and (clip / "clip.avi").exists()


class TestFlowVis:
    def test_wheel_shape(self):
        assert make_color_wheel().shape == (55, 3)

    def test_flow_image(self):
        flow = np.zeros((8, 8, 2), np.float32)
        flow[..., 0] = 1.0
        img = flow_to_image(flow)
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8
        # uniform flow -> uniform color
        assert np.all(img == img[0, 0])


class TestSRNLegacy:
    def test_srn4(self):
        m = S.SRN4(n_scales=2, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 32, 3))
        v = m.init(KEY, x)
        preds, feat, _ = m.apply(v, x)
        assert len(preds) == 2
        assert preds[-1].shape == (1, 16, 32, 3)
        assert preds[0].shape == (1, 8, 16, 3)

    def test_srn4_seg_and_sharp(self):
        seg = jnp.zeros((1, 16, 32, 20))
        m = S.SRN4Seg(n_scales=1, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 32, 3))
        v = m.init(KEY, x, seg)
        preds, _, _ = m.apply(v, x, seg)
        assert preds[-1].shape == (1, 16, 32, 3)

        m2 = S.SRN4Sharp(n_scales=1, dtype=jnp.float32)
        nb = jnp.zeros((1, 16, 32, 6))
        v2 = m2.init(KEY, x, None, nb)
        preds2, _, _ = m2.apply(v2, x, None, nb)
        assert preds2[-1].shape == (1, 16, 32, 3)

    def test_attn_refine(self):
        m = S.AttnRefine(dtype=jnp.float32)
        x = jnp.zeros((1, 16, 32, 3))
        nb = jnp.zeros((1, 16, 32, 6))
        v = m.init(KEY, x, neighbors=nb)
        out = m.apply(v, x, neighbors=nb)
        assert out.shape == (1, 16, 32, 3)

    def test_ms_base_refine(self):
        m = S.MSBaseRefine(dtype=jnp.float32)
        x = jnp.zeros((1, 16, 32, 3))
        v = m.init(KEY, x)
        out = m.apply(v, x)
        assert out.shape == (1, 16, 32, 3)


def test_create_trackrcnn_track_pkl(tmp_path):
    """TrackR-CNN txt tree -> per-clip (3,N,5) bbox arrays via the CLI
    (create_vid_file.py:701-748; reference never saved its output — we do,
    in the create_bbox_file format)."""
    import pickle
    import numpy as np
    from deep_video_interpolation_extrapolation_tpu.tools import build_clips

    frames = [f"train/aachen/aachen_000000_{i:06d}" for i in (0, 18, 9)]
    clip_pkl = tmp_path / "clips.pkl"
    with open(clip_pkl, "wb") as f:
        pickle.dump({"train": [frames]}, f)
    d = tmp_path / "tracks" / "train" / "aachen"
    d.mkdir(parents=True)
    # two tracks; track 1's mid-frame box is tiny (filtered at thresh 100)
    lines = {
        frames[0]: "3,10,20,110,220---7,0,0,5,5",
        frames[1]: "3,14,24,114,224---7,1,1,6,6",
        frames[2]: "3,12,22,112,222---7,0,0,6,6",
    }
    for frame, line in lines.items():
        (d / (frame.split("/")[-1] + "_leftImg8bit.txt")).write_text(line)

    bbox_pkl = tmp_path / "boxes.pkl"
    out_clip_pkl = tmp_path / "clips_out.pkl"
    build_clips.main(["trackrcnn", str(clip_pkl), str(tmp_path / "tracks"),
                      str(bbox_pkl), str(out_clip_pkl),
                      "--area_thresh", "100"])
    with open(bbox_pkl, "rb") as f:
        boxes = pickle.load(f)
    arr = boxes["train"][0]
    assert arr.shape == (3, 1, 5)            # tiny track dropped
    np.testing.assert_allclose(arr[0, 0, 1:], [10, 20, 110, 220])
    # score column = area ratio at 512x1024 of each frame's own box
    np.testing.assert_allclose(arr[1, 0, 0], (114 - 14) * (224 - 24) / (512 * 1024.0))
    with open(out_clip_pkl, "rb") as f:
        assert pickle.load(f)["train"] == [frames]


class TestFlowMagnitude:
    """flow_magnitude / filter_clips_by_flow (the agong flow-stats port +
    the --ef 'effective flow' split builder, reference flow_process.py)."""

    def _frame(self, shift):
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (64, 96, 3), np.uint8)
        return np.roll(base, shift, axis=1)

    def test_static_pair_near_zero(self):
        a = self._frame(0)
        assert video_tools.flow_magnitude(a, a) < 0.1

    def test_shifted_pair_sees_motion(self):
        mag = video_tools.flow_magnitude(self._frame(0), self._frame(6))
        assert mag > 1.0, mag

    def test_filter_clips_by_flow(self, tmp_path):
        frames = {"a": self._frame(0), "b": self._frame(6)}
        clip_file = tmp_path / "clips.pkl"
        with open(clip_file, "wb") as f:
            pickle.dump({"train": [["a", "b"], ["a", "a"]]}, f)
        out_file = str(tmp_path / "kept.pkl")
        video_tools.filter_clips_by_flow(
            str(clip_file), out_file, lambda n: frames[n], min_mag=1.0)
        with open(out_file, "rb") as f:
            kept = pickle.load(f)
        assert kept["train"] == [["a", "b"]]
