"""Native host-pipeline core (native/dvie_host.cpp via native/host.py).

Pins: (1) the fused C decode/flip/crop/normalize/one-hot kernels are
BIT-IDENTICAL to the PIL/numpy pipeline they accelerate; (2) every
format or content the native path does not handle is declined (None)
and the dataset falls back to PIL with unchanged semantics; (3) the
dataset/loader produce identical batches with the native path on/off.
"""

import io
import pickle

import numpy as np
import pytest
from PIL import Image

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
    IMG_EXT,
    SEG_EXT,
    N_CLASSES,
)
from deep_video_interpolation_extrapolation_tpu.data.folder import (
    ClipDataset,
    Loader,
    TripletDataset,
)
from deep_video_interpolation_extrapolation_tpu.native import host

pytestmark = pytest.mark.skipif(
    not host.available(),
    reason="native host library unavailable (no toolchain/libpng)")


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _cfg(**kw):
    base = dict(runner="INTER", model="InterNet", syn_type="inter",
                mode="xs2xs", input_h=128, input_w=128, batch_size=2,
                dataset="cityscape", num_track_per_img=4)
    base.update(kw)
    return Config(**base)


class TestFusedKernels:
    def test_rgb_norm_bitexact_vs_numpy(self):
        rng = np.random.RandomState(0)
        for flip in (False, True):
            for (h, w, y0, x0, ch, cw) in [(150, 150, 3, 7, 128, 128),
                                           (40, 56, 0, 0, 40, 56),
                                           (33, 61, 5, 9, 17, 31)]:
                arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                data = _png_bytes(arr)
                got = host.decode_rgb_norm(data, y0, x0, ch, cw, flip, 0)
                ref = arr[:, ::-1] if flip else arr
                ref = ref[y0:y0 + ch, x0:x0 + cw]
                ref = ref.astype(np.float32) / 255.0 * 2.0 - 1.0
                assert got is not None
                assert got.dtype == np.float32
                np.testing.assert_array_equal(got, ref)

    def test_rgb_norm_mode1_bitexact(self):
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
        got = host.decode_rgb_norm(_png_bytes(arr), 0, 0, 48, 64, False, 1)
        ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_array_equal(got, ref)

    def test_seg_onehot_bitexact_vs_npeye(self):
        rng = np.random.RandomState(2)
        for flip in (False, True):
            arr = rng.randint(0, N_CLASSES, (150, 150)).astype(np.uint8)
            data = _png_bytes(arr)
            got = host.decode_seg_onehot(data, 4, 11, 128, 128, flip,
                                         N_CLASSES)
            ref = arr[:, ::-1] if flip else arr
            ref = ref[4:4 + 128, 11:11 + 128]
            ref = np.eye(N_CLASSES, dtype=np.float32)[ref]
            assert got is not None
            np.testing.assert_array_equal(got, ref)

    def test_seg_id_out_of_range_declined(self):
        arr = np.full((16, 16), N_CLASSES, np.uint8)  # id 20 > max 19
        assert host.decode_seg_onehot(_png_bytes(arr), 0, 0, 16, 16, False,
                                      N_CLASSES) is None

    def test_crop_out_of_bounds_declined(self):
        arr = np.zeros((16, 16, 3), np.uint8)
        assert host.decode_rgb_norm(_png_bytes(arr), 0, 0, 17, 16, False,
                                    0) is None

    def test_unsupported_formats_declined(self):
        rgba = np.zeros((8, 8, 4), np.uint8)
        assert host.native_decodable(_png_bytes(rgba), 3) is None
        pal = Image.fromarray(
            np.zeros((8, 8, 3), np.uint8)).convert("P")
        buf = io.BytesIO()
        pal.save(buf, format="PNG")
        assert host.native_decodable(buf.getvalue(), 3) is None
        # rgb file is not decodable as gray and vice versa
        rgb = _png_bytes(np.zeros((8, 8, 3), np.uint8))
        gray = _png_bytes(np.zeros((8, 8), np.uint8))
        assert host.native_decodable(rgb, 1) is None
        assert host.native_decodable(gray, 3) is None
        assert host.native_decodable(rgb, 3) == (8, 8)
        assert host.native_decodable(gray, 1) == (8, 8)

    def test_corrupt_bytes_declined(self):
        assert host.png_info(b"not a png at all") is None
        good = _png_bytes(np.zeros((8, 8, 3), np.uint8))
        assert host.decode_rgb_norm(good[:40], 0, 0, 8, 8, False, 0) is None

    def test_decode_u8_roundtrip(self):
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (21, 35, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, (21, 35), dtype=np.uint8)
        np.testing.assert_array_equal(host.decode_u8(_png_bytes(rgb), 3), rgb)
        np.testing.assert_array_equal(host.decode_u8(_png_bytes(gray), 1),
                                      gray)


class TestEncoder:
    def test_encode_roundtrip_rgb_and_gray(self):
        rng = np.random.RandomState(7)
        for arr in (rng.randint(0, 256, (37, 61, 3), dtype=np.uint8),
                    rng.randint(0, 20, (37, 61)).astype(np.uint8)):
            for level in (0, 1, 6):
                data = host.encode_png(arr, level=level)
                assert data is not None
                # PIL decodes our stream back to the exact pixels
                got = np.asarray(Image.open(io.BytesIO(data)))
                np.testing.assert_array_equal(got, arr)
                # and so does the native decoder
                ch = 3 if arr.ndim == 3 else 1
                np.testing.assert_array_equal(host.decode_u8(data, ch), arr)

    def test_encode_rejects_bad_input(self):
        assert host.encode_png(np.zeros((4, 4), np.float32)) is None
        assert host.encode_png(np.zeros((4, 4, 4), np.uint8)) is None

    def test_save_png_native_and_fallback(self, tmp_path, monkeypatch):
        arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "1")
        host.save_png(str(tmp_path / "a.png"), arr)
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "0")
        host.save_png(str(tmp_path / "b.png"), arr)
        a = np.asarray(Image.open(tmp_path / "a.png"))
        b = np.asarray(Image.open(tmp_path / "b.png"))
        np.testing.assert_array_equal(a, arr)
        np.testing.assert_array_equal(b, arr)

    def test_encode_non_contiguous(self):
        rng = np.random.RandomState(9)
        big = rng.randint(0, 256, (20, 20, 3), dtype=np.uint8)
        view = big[::2, ::2]  # non-contiguous: wrapper must copy
        data = host.encode_png(view)
        got = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(got, view)


def _make_tree(tmp_path, n_clips=2, src=150):
    rng = np.random.RandomState(0)
    img_dir, seg_dir = tmp_path / "imgs", tmp_path / "segs"
    clips = []
    for c in range(n_clips):
        clip = []
        for i in range(3):
            rel = f"train/scene/clip{c}_{i:06d}"
            clip.append(rel)
            p = img_dir / (rel + IMG_EXT)
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.randint(0, 255, (src, src, 3), dtype=np.uint8)).save(p)
            q = seg_dir / (rel + SEG_EXT)
            q.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.randint(0, 20, (src, src)).astype(np.uint8)).save(q)
        clips.append(clip)
    return str(img_dir), str(seg_dir), clips


class TestDatasetEquivalence:
    def test_clip_dataset_native_equals_pil(self, tmp_path, monkeypatch):
        img_dir, seg_dir, clips = _make_tree(tmp_path)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        for idx in range(len(clips)):
            for seed in range(4):  # covers flip on/off + varied crops
                monkeypatch.setenv("DVIE_NATIVE_LOADER", "1")
                a = ds.sample(idx, np.random.RandomState(seed))
                monkeypatch.setenv("DVIE_NATIVE_LOADER", "0")
                b = ds.sample(idx, np.random.RandomState(seed))
                assert a.keys() == b.keys()
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_loader_batches_native_equals_pil(self, tmp_path, monkeypatch):
        img_dir, seg_dir, clips = _make_tree(tmp_path)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "1")
        with_native = list(Loader(ds, 2, seed=7, num_workers=2))
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "0")
        without = list(Loader(ds, 2, seed=7, num_workers=0))
        assert len(with_native) == len(without)
        for a, b in zip(with_native, without):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_triplet_native_equals_pil(self, tmp_path, monkeypatch):
        rng = np.random.RandomState(5)
        seq = tmp_path / "seq" / "0001"
        seq.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (64, 112, 3), dtype=np.uint8)
            ).save(seq / f"im{i + 1}.png")
        cfg = _cfg(dataset="vimeo", mode="xx2x")
        ds = TripletDataset(cfg, ["0001"], str(tmp_path / "seq"))
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "1")
        a = ds.sample(0, np.random.RandomState(0))
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "0")
        b = ds.sample(0, np.random.RandomState(0))
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_bad_seg_id_raises_like_npeye(self, tmp_path):
        """A seg id beyond N_CLASSES is declined natively and the PIL
        fallback raises numpy's IndexError — never silent corruption."""
        img_dir, seg_dir, clips = _make_tree(tmp_path, n_clips=1)
        bad = np.full((150, 150), 99, np.uint8)
        Image.fromarray(bad).save(
            f"{seg_dir}/{clips[0][1]}{SEG_EXT}")
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir)
        with pytest.raises(IndexError):
            ds.sample(0, np.random.RandomState(1))
