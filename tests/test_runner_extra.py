"""Runner coverage: checkpoint-range validation sweep (main.py:100-106) and
extrapolation cycgen rollout."""

import glob
import os

import numpy as np

from deep_video_interpolation_extrapolation_tpu.cli.main import run
from deep_video_interpolation_extrapolation_tpu.cli.options import parse_args

BASE = ("--dataset synthetic --input_h 32 --input_w 64 --bs 2 --epochs 2 "
        "--disp_interval 2 --compute_dtype float32")


def test_checkepoch_range_sweep(tmp_path):
    # train 2 epochs -> 2 checkpoints
    cfg = parse_args(
        (BASE + f" --save_dir {tmp_path} --split train --syn_type inter "
         "INTER --model InterNet --train_coarse").split())
    exp = str(tmp_path / "exp")
    run(cfg, exp_dir=exp)
    ckpts = sorted(glob.glob(os.path.join(exp, "checkpoint", "*")))
    assert len(ckpts) == 2

    # sweep both epochs
    cfg_val = parse_args(
        (BASE + f" --split val --syn_type inter --load_dir {exp} "
         "--checksession 0 --checkepoch_range --checkepoch_low 1 "
         "--checkepoch_up 2 INTER --model InterNet --load_model InterNet"
         ).split())
    results = run(cfg_val, exp_dir=str(tmp_path / "val_exp"))
    assert sorted(results.keys()) == [1, 2]
    for ep, metrics in results.items():
        assert np.isfinite(metrics["coarse_psnr"]), ep


def test_cycgen_extrapolation(tmp_path):
    cfg = parse_args(
        (BASE + " --split cycgen --syn_type extra EXTRA --model ExtraNet "
         "--num_pred_step 2").split())
    out_root = run(cfg, exp_dir=str(tmp_path / "exp"))
    clips = sorted(glob.glob(os.path.join(out_root, "clip_*")))
    assert clips
    pngs = glob.glob(os.path.join(clips[0], "rgb", "*.png"))
    assert len(pngs) == 4  # 2 context + 2 rolled-out frames


def test_cycgen_extrapolation_fix_init_frames(tmp_path):
    """fix_init_frames models take a 3-frame input (fixed second init
    frame prepended, extra.py); the cycgen rollout must build the same
    window or every forward crashes on channel mismatch.  (The
    reference's own mini_test forgets this — a documented fix.)"""
    cfg = parse_args(
        (BASE + " --split cycgen --syn_type extra EXTRA --model ExtraNet "
         "--num_pred_step 2 --fix_init_frames").split())
    out_root = run(cfg, exp_dir=str(tmp_path / "exp"))
    clips = sorted(glob.glob(os.path.join(out_root, "clip_*")))
    assert clips
    pngs = glob.glob(os.path.join(clips[0], "rgb", "*.png"))
    assert len(pngs) == 4


def test_extra_vae_gt_width_init(tmp_path):
    """A gt-consuming coarse (VAEHRNet) with num_pred_once=2: the runner
    must initialize it at the train step's gt width (frames 3..4) — a
    one-frame init used to crash the first step on a VAE-encoder kernel
    shape mismatch.

    The CLI cannot spell this combo: the reference's EXTRA parser pins
    --coarse_model to ['HRNet'] (options/options.py:184-186) and ours
    mirrors it flag-for-flag (test_options_parity), so the VAE coarse is
    a LIBRARY-level extra capability — build the Config past the parser.
    """
    import dataclasses

    cfg = parse_args(
        (BASE + f" --save_dir {tmp_path} --split train --syn_type extra "
         "--epochs 1 EXTRA --model ExtraNet "
         "--train_coarse --num_pred_once 2").split())
    cfg = dataclasses.replace(cfg, coarse_model="VAEHRNet")
    run(cfg, exp_dir=str(tmp_path / "exp"))


def test_refine_vgg_weight_initializes_frozen_vgg(tmp_path):
    """--vgg_w 0 with --refine_vgg_w 20: the refine bundle consumes
    refine_vgg_weight, so the frozen VGG must still be initialized (the
    old gate keyed on vgg_weight alone and silently zeroed every
    refine_*_vgg_loss)."""
    from deep_video_interpolation_extrapolation_tpu.train.runner import Runner

    cfg = parse_args(
        (BASE + f" --save_dir {tmp_path} --split train --syn_type inter "
         "--vgg_w 0 INTER --model InterRefineNet --refine "
         "--refine_model SRNRefine --train_refine --refine_vgg_w 20").split())
    r = Runner(cfg, str(tmp_path / "exp"))
    assert "vgg" in r.state.frozen
