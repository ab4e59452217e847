"""Reference-contract cycgen (InterTrainer.py:691-856): sliding-window
mini_test rollout reading NN.0.png trees from --cycgen_load_dir and writing
the reference's extra_int_{interval}_len_{vid}_nearest/{rgb,seg,vis_seg}
layout; mycycgen consumes the written tree directly."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.train.runner import Runner

H, W = 32, 64


def _make_load_tree(root, clips, indices):
    rng = np.random.RandomState(0)
    for clip in clips:
        os.makedirs(os.path.join(root, "rgb", clip), exist_ok=True)
        os.makedirs(os.path.join(root, "seg", clip), exist_ok=True)
        for i in indices:
            rgb = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            ids = rng.randint(0, 20, (H, W)).astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(root, "rgb", clip, f"{i:0>2d}.0.png"))
            Image.fromarray(ids).save(
                os.path.join(root, "seg", clip, f"{i:0>2d}.0.png"))


def _cfg(tmp_path, load_dir, **kw):
    return Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        split="cycgen", train_coarse=True, coarse_model="HRNet",
        compute_dtype="float32", input_h=H, input_w=W, batch_size=1,
        dataset="cityscape", cycgen_load_dir=load_dir, **kw)


@pytest.fixture(scope="module")
def cycgen_tree(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cycgen")
    load_dir = str(tmp_path / "load")
    clips = ["val/frankfurt/frankfurt_000000_000275",
             "val/munster/munster_000001_000019"]
    # inputs at indices 0 and interval=2 (InterTrainer.py:721-722)
    _make_load_tree(load_dir, clips, indices=(0, 2))
    cfg = _cfg(tmp_path, load_dir, interval=2, vid_length=3,
               num_pred_step=3, num_pred_once=1)
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir, exist_ok=True)
    runner = Runner(cfg, exp_dir)
    out_root = runner.cycgen()
    return cfg, runner, clips, out_root


def test_cycgen_reference_path_grammar(cycgen_tree):
    """The written tree matches the reference's path grammar
    (InterTrainer.py:698-779): cycgen/<dataset>/<HxW>/
    extra_int_{interval}_len_{vid}_nearest/{rgb,seg,vis_seg}/<clipdir>/
    NN.0.png with NN = i*interval for i in range(vid_length+2)."""
    cfg, _runner, clips, out_root = cycgen_tree
    assert out_root.endswith(
        os.path.join("cycgen", "cityscape", f"{H}x{W}",
                     "extra_int_2_len_3_nearest"))
    expect_names = [f"{i * 2:0>2d}.0.png" for i in range(3 + 2)]
    for clip in clips:
        for kind in ("rgb", "seg", "vis_seg"):
            d = os.path.join(out_root, kind, clip)
            assert os.path.isdir(d), d
            assert sorted(os.listdir(d)) == sorted(expect_names), d
    # rgb frames are real images; seg frames are id maps in [0, 20)
    sample_rgb = np.asarray(Image.open(
        os.path.join(out_root, "rgb", clips[0], "04.0.png")))
    assert sample_rgb.shape == (H, W, 3) and sample_rgb.dtype == np.uint8
    sample_ids = np.asarray(Image.open(
        os.path.join(out_root, "seg", clips[0], "04.0.png")))
    assert sample_ids.shape == (H, W) and sample_ids.max() < 20
    # the first two frames are the inputs themselves (InterTrainer.py:745)
    in_rgb = np.asarray(Image.open(os.path.join(
        cfg.cycgen_load_dir, "rgb", clips[0], "00.0.png")))
    out_rgb0 = np.asarray(Image.open(
        os.path.join(out_root, "rgb", clips[0], "00.0.png")))
    np.testing.assert_array_equal(in_rgb, out_rgb0)


def test_mini_test_window_update_num_pred_once_1(cycgen_tree):
    """num_pred_once == 1 slides the window by one: step k's input pair is
    (frame[k], frame[k+1]) of the growing sequence (InterTrainer.py:835-839).
    Verified by replaying the rollout by hand through the same model."""
    cfg, runner, _clips, _out = cycgen_tree
    rng = np.random.RandomState(7)
    imgs = [jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
            for _ in range(2)]
    segs = [jnp.asarray(np.eye(20, dtype=np.float32)[
        rng.randint(0, 20, (1, H, W))]) for _ in range(2)]
    import jax
    runner.rng = jax.random.PRNGKey(123)
    preds, ids = runner._mini_test(imgs, segs)
    assert len(preds) == cfg.num_pred_step * cfg.num_pred_once == 3

    # hand rollout
    runner.rng = jax.random.PRNGKey(123)
    variables = {"params": runner.state.params}

    def fwd(x, seg):
        return runner.model.apply(variables, x, seg, train=False)

    img1, img2 = imgs[0] * 2 - 1, imgs[1] * 2 - 1
    seg1, seg2 = segs
    for k in range(3):
        out_img, out_seg = fwd(jnp.concatenate([img1, img2], -1),
                               jnp.concatenate([seg1, seg2], -1))
        pred = jnp.clip((out_img + 1) / 2, 0, 1)
        np.testing.assert_allclose(np.asarray(preds[k]), np.asarray(pred),
                                   atol=1e-5)
        pid = jnp.argmax(out_seg, -1)
        np.testing.assert_array_equal(np.asarray(ids[k]), np.asarray(pid))
        img1, img2 = img2, pred * 2 - 1
        seg1, seg2 = seg2, jax.nn.one_hot(pid, 20, dtype=seg1.dtype)


@pytest.mark.parametrize("fix_init", [False, True])
def test_cycgen_reference_extra(tmp_path, fix_init):
    """Extrapolation follows the SAME load/save tree contract
    (ExtraTrainer.py:586-757); with fix_init_frames the second init frame
    is prepended at every rollout step like training (extra.py /
    ExtraTrainer.py:267-270 — the reference's own mini_test forgets this
    and would crash on a fix_init_frames-trained model)."""
    load_dir = str(tmp_path / "load")
    clips = ["val/frankfurt/frankfurt_000000_000275"]
    _make_load_tree(load_dir, clips, indices=(0, 2))
    cfg = Config(
        runner="EXTRA", model="ExtraNet", syn_type="extra", mode="xs2xs",
        split="cycgen", train_coarse=True, coarse_model="HRNet",
        compute_dtype="float32", input_h=H, input_w=W, batch_size=1,
        dataset="cityscape", cycgen_load_dir=load_dir, interval=2,
        vid_length=2, num_pred_step=2, num_pred_once=1,
        fix_init_frames=fix_init)
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir, exist_ok=True)
    runner = Runner(cfg, exp_dir)
    out_root = runner.cycgen()
    assert out_root.endswith(
        os.path.join("cycgen", "cityscape", f"{H}x{W}",
                     "extra_int_2_len_2_nearest"))
    expect_names = [f"{i * 2:0>2d}.0.png" for i in range(2 + 2)]
    for kind in ("rgb", "seg", "vis_seg"):
        d = os.path.join(out_root, kind, clips[0])
        assert sorted(os.listdir(d)) == sorted(expect_names), d
    # the first two frames are the inputs themselves
    in_rgb = np.asarray(Image.open(os.path.join(
        load_dir, "rgb", clips[0], "02.0.png")))
    out_rgb = np.asarray(Image.open(
        os.path.join(out_root, "rgb", clips[0], "02.0.png")))
    np.testing.assert_array_equal(in_rgb, out_rgb)


def test_final_output_unpacking():
    """The rollout/save stage per composite family: stage3_rgbs[-1] for
    InterStage3Net (the eval step's 'final' output), refine_rgbs[-1] for
    InterRefineNet (InterTrainer.py:825), the inpainted composite for
    ExtraInpaintNet (ExtraTrainer.py:719-721), coarse otherwise."""
    rgb, seg = jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4, 20))
    r1, r2, s1, s2 = (jnp.full((1, 4, 4, 3), v) for v in (1.0, 2.0, 3.0, 4.0))
    mask, inp = jnp.zeros((1, 4, 4, 1)), jnp.full((1, 4, 4, 3), 9.0)
    out = Runner._final_output((rgb, seg, [r1, r2], [s1, s2], [None]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(s2))
    out = Runner._final_output((rgb, seg, [r1, r2]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(r2))
    out = Runner._final_output((rgb, seg, mask, inp))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(inp))
    out = Runner._final_output((rgb, seg))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(rgb))
    out = Runner._final_output((rgb, seg, mask))  # (rgb, seg, mask) extra
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(rgb))


def test_mycycgen_consumes_cycgen_output(cycgen_tree):
    """mycycgen pointed at the cycgen-written tree fills the midpoint frame
    (VERDICT r1 #4: 'mycycgen can consume cycgen's output directly')."""
    cfg, runner, clips, out_root = cycgen_tree
    runner.cfg = cfg.replace(cycgen_load_dir=out_root)
    # frames exist at 00/02/04/06/08 -> interpolate 03.0 from 02.0/04.0
    runner.mycycgen(first_index=2)
    for clip in clips:
        assert os.path.exists(
            os.path.join(out_root, "rgb", clip, "03.0.png")), clip
        assert os.path.exists(
            os.path.join(out_root, "seg", clip, "03.0.png")), clip
