"""Device-side one-hot contract (seg_ids mode).

The Cityscapes loader ships (B, H, W) uint8 class ids; the jitted steps
expand them on device (train/common.seg_oh).  Pins: (1) the ids-mode
dataset is exactly argmax of the one-hot-mode dataset under the same
RNG; (2) train/eval steps produce IDENTICAL losses and gradients from
either contract; (3) the loud-failure behavior for out-of-range ids is
preserved; (4) float batches pass through seg_oh untouched.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
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
)
from deep_video_interpolation_extrapolation_tpu.data.synthetic import (
    synthetic_batch,
)
from deep_video_interpolation_extrapolation_tpu.models.unet import UNet
from deep_video_interpolation_extrapolation_tpu.train import (
    inter as inter_lib,
    state as state_lib,
)
from deep_video_interpolation_extrapolation_tpu.train.common import (
    expand_segs,
    seg_oh,
)

import flax.linen as nn

H, W, B = 16, 32, 2


def _make_tree(tmp_path, n_clips=2, src=150, bad_id=False):
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
            hi = 99 if bad_id else 19
            Image.fromarray(
                rng.randint(0, hi + 1, (src, src)).astype(np.uint8)).save(q)
        clips.append(clip)
    return str(img_dir), str(seg_dir), clips


def _cfg(**kw):
    base = dict(runner="INTER", model="InterNet", syn_type="inter",
                mode="xs2xs", input_h=128, input_w=128, batch_size=2,
                dataset="cityscape", num_track_per_img=4,
                compute_dtype="float32")
    base.update(kw)
    return Config(**base)


class TestIdsDataset:
    @pytest.mark.parametrize("native", ["1", "0"])
    def test_ids_match_onehot_argmax(self, tmp_path, monkeypatch, native):
        monkeypatch.setenv("DVIE_NATIVE_LOADER", native)
        img_dir, seg_dir, clips = _make_tree(tmp_path)
        cfg = _cfg(split="train")
        kw = dict(split="train", img_dir=img_dir, seg_dir=seg_dir)
        ds_ids = ClipDataset(cfg, clips, seg_ids=True, **kw)
        ds_oh = ClipDataset(cfg, clips, seg_ids=False, **kw)
        for seed in range(3):
            a = ds_ids.sample(0, np.random.RandomState(seed))
            b = ds_oh.sample(0, np.random.RandomState(seed))
            for i in (1, 2, 3):
                ids = a[f"seg{i}"]
                assert ids.dtype == np.uint8 and ids.shape == (128, 128)
                np.testing.assert_array_equal(
                    ids, np.argmax(b[f"seg{i}"], -1).astype(np.uint8))
                np.testing.assert_array_equal(a[f"frame{i}"], b[f"frame{i}"])

    @pytest.mark.parametrize("native", ["1", "0"])
    def test_bad_id_raises(self, tmp_path, monkeypatch, native):
        monkeypatch.setenv("DVIE_NATIVE_LOADER", native)
        img_dir, seg_dir, clips = _make_tree(tmp_path, n_clips=1, bad_id=True)
        ds = ClipDataset(_cfg(split="train"), clips, split="train",
                         img_dir=img_dir, seg_dir=seg_dir, seg_ids=True)
        with pytest.raises(IndexError):
            ds.sample(0, np.random.RandomState(0))


class TestSegOh:
    def test_float_passthrough(self):
        x = jnp.ones((2, 4, 4, N_CLASSES), jnp.float32)
        assert seg_oh(x) is x

    def test_uint8_expands(self):
        ids = jnp.arange(N_CLASSES, dtype=jnp.uint8).reshape(1, 4, 5)
        oh = seg_oh(ids)
        assert oh.shape == (1, 4, 5, N_CLASSES)
        np.testing.assert_array_equal(
            np.asarray(oh), np.eye(N_CLASSES, dtype=np.float32)[
                np.asarray(ids)])

    def test_expand_segs_only_touches_seg_keys(self):
        batch = {"frame1": jnp.zeros((1, 2, 2, 3), jnp.uint8),
                 "seg1": jnp.zeros((1, 2, 2), jnp.uint8)}
        out = expand_segs(batch)
        assert out["frame1"].dtype == jnp.uint8
        assert out["seg1"].shape == (1, 2, 2, N_CLASSES)


class TinyInterNet(nn.Module):
    cfg: Config

    def setup(self):
        self.coarse_model = UNet(dtype=jnp.float32)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train=True):
        return self.coarse_model(rgb, seg, train=train)


class TestStepEquivalence:
    def _ids_batch(self, seed=0):
        """Synthetic batch in both contracts: one-hot, and its argmax ids."""
        oh = {k: jnp.asarray(v) for k, v in
              synthetic_batch(B, H, W, vid_len=3, seed=seed).items()}
        ids = dict(oh)
        for k in list(ids):
            if k.startswith("seg"):
                ids[k] = jnp.argmax(oh[k], -1).astype(jnp.uint8)
        return oh, ids

    def test_train_step_identical_losses_and_params(self):
        cfg = _cfg(dataset="synthetic", input_h=H, input_w=W,
                   train_coarse=True, vgg_weight=0.0, batch_size=B)
        model = TinyInterNet(cfg)
        oh, ids = self._ids_batch()
        x = jnp.concatenate([oh["frame1"], oh["frame3"]], axis=-1)
        seg = jnp.concatenate([oh["seg1"], oh["seg3"]], axis=-1)
        variables = model.init(jax.random.PRNGKey(0), x, seg, train=True)
        step = jax.jit(inter_lib.make_train_step(cfg, model))
        rng = jax.random.PRNGKey(1)
        s_oh = state_lib.create_train_state(cfg, variables, frozen={})
        s_ids = state_lib.create_train_state(cfg, variables, frozen={})
        for i in range(2):
            s_oh, l_oh = step(s_oh, oh, jax.random.fold_in(rng, i))
            s_ids, l_ids = step(s_ids, ids, jax.random.fold_in(rng, i))
        for k in l_oh:
            np.testing.assert_allclose(np.asarray(l_oh[k]),
                                       np.asarray(l_ids[k]), rtol=0,
                                       atol=0, err_msg=k)
        for (pa, pb) in zip(jax.tree_util.tree_leaves(s_oh.params),
                            jax.tree_util.tree_leaves(s_ids.params)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_eval_step_identical_metrics(self):
        cfg = _cfg(dataset="synthetic", input_h=H, input_w=W,
                   train_coarse=True, vgg_weight=0.0, batch_size=B)
        model = TinyInterNet(cfg)
        oh, ids = self._ids_batch(seed=3)
        x = jnp.concatenate([oh["frame1"], oh["frame3"]], axis=-1)
        seg = jnp.concatenate([oh["seg1"], oh["seg3"]], axis=-1)
        variables = model.init(jax.random.PRNGKey(0), x, seg, train=True)
        state = state_lib.create_train_state(cfg, variables, frozen={})
        ev = jax.jit(inter_lib.make_eval_step(cfg, model))
        rng = jax.random.PRNGKey(2)
        m_oh = ev(state, oh, rng)
        m_ids = ev(state, ids, rng)
        for k in m_oh:
            np.testing.assert_array_equal(np.asarray(m_oh[k]),
                                          np.asarray(m_ids[k]), err_msg=k)


class TestLoaderIds:
    def test_loader_stacks_ids(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DVIE_NATIVE_LOADER", "1")
        img_dir, seg_dir, clips = _make_tree(tmp_path)
        cfg = _cfg(split="train")
        ds = ClipDataset(cfg, clips, split="train", img_dir=img_dir,
                         seg_dir=seg_dir, seg_ids=True)
        batch = next(iter(Loader(ds, 2, seed=0, num_workers=2)))
        assert batch["seg1"].dtype == np.uint8
        assert batch["seg1"].shape == (2, 128, 128)
        assert batch["frame1"].shape == (2, 128, 128, 3)
