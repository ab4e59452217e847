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
