"""Integrated end-to-end smoke on the REAL device: fake-Cityscapes data
through the full CLI lifecycle.

Round-2's entire test suite ran on the forced-CPU mesh; the TPU chip had
only ever executed synthetic jit loops (bench.py/tools_*), which let a
TPU-only OOM in the public --highres_large config slip through.  This
tool drives the class of path that catches that: the real
`cli/main.py` lifecycle (reference main.py:110-119) on whatever device
the environment resolves (the TPU chip under axon), over a REAL
pkl -> loader -> native-decode -> jitted-train-step -> checkpoint ->
val-metrics -> cycgen-tree chain built from a generated fake-Cityscapes
PNG tree (reference chain data.py:21-74 -> folder.py:76-313).

Stages:
  1. Build a fake-Cityscapes tree (150x150 train/val frames with a
     moving textured square so training has real signal) + clip pkls
     via tools/build_clips (create_root_clip -> create_interp_lsclip —
     the offline-builder path, create_vid_file.py:63-758).
  2. `--split train`: N epochs of the jitted step via the prefetching
     loader; assert the logged loss DESCENDS and checkpoints appear with
     the reference filename contract.
  3. `--split val --r --checkepoch`: selective restore + full val
     metrics (L1/PSNR/SSIM/IoU/VGG-cos).
  4. `--split cycgen`: recursive generation PNG trees.

Writes docs/SMOKE_E2E_r3.json {stage: {...}} and prints one JSON line.
Usage: python tools_smoke_e2e.py [--epochs 12] [--bs 4] [--keep]
Stage timeout is 1500 s: on the TPU relay the train stage pays several
fresh-shape compiles (train step, val metrics, viz grids) at ~1-2 min
each before the fast per-iter loop; 580 s was enough on CPU only.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def build_fixture(root: str, n_vids=2, clip_len=30, src=150, interval=3,
                  n_track=4):
    """Fake-Cityscapes tree + the clip pkl the dataset factory expects.

    ``src`` is the stored frame size: an int for square frames, or an
    (H, W) tuple — tools_e2ebench uses the dataset's real 512x1024
    storage size so the host decode cost is the honest one."""
    from PIL import Image

    from deep_video_interpolation_extrapolation_tpu.tools import build_clips

    src_h, src_w = (src, src) if isinstance(src, int) else src
    img_root = os.path.join(root, "imgs")
    seg_root = os.path.join(root, "segs")
    rng = np.random.RandomState(0)
    scene_dict = {"train": ["aachen"], "val": ["frankfurt"]}
    for split, scenes in scene_dict.items():
        for scene in scenes:
            d_img = os.path.join(img_root, split, scene)
            d_seg = os.path.join(seg_root, split, scene)
            os.makedirs(d_img, exist_ok=True)
            os.makedirs(d_seg, exist_ok=True)
            vids = range(n_vids if split == "train" else 1)
            for vid in vids:
                # static textured background + a square moving linearly:
                # real temporal structure, so interpolation loss can drop
                bg = rng.randint(0, 255, (src_h, src_w, 3), dtype=np.uint8)
                sq = max(4, min(src_h, src_w) // 6)
                tex = rng.randint(0, 255, (sq, sq, 3), dtype=np.uint8)
                span = min(src_h, src_w) - sq - 1
                for t in range(clip_len):
                    img = bg.copy()
                    seg = np.full((src_h, src_w), 2, np.uint8)  # building
                    y = (t * 3) % span
                    x = (t * 2) % span
                    img[y:y + sq, x:x + sq] = tex
                    seg[y:y + sq, x:x + sq] = 13  # car
                    stem = f"{scene}_{vid:06d}_{t:06d}"
                    Image.fromarray(img).save(
                        os.path.join(d_img, stem + "_leftImg8bit.png"))
                    Image.fromarray(seg).save(
                        os.path.join(d_seg, stem + "_gtFine_myseg_id.png"))

    load_dir = os.path.join(root, "load_files")
    os.makedirs(load_dir, exist_ok=True)
    root_pkl = os.path.join(load_dir, "root_clip.pkl")
    build_clips.create_root_clip(img_root, root_pkl, clip_len=clip_len,
                                 scene_dict=scene_dict)
    # the exact name data/datasets.clip_file_path derives for inter mode
    clip_pkl = os.path.join(
        load_dir,
        f"int_{interval}_len_3_max_{n_track}bb_area_3000_extra_panet_"
        "lsclip.pkl")
    out = build_clips.create_interp_lsclip(root_pkl, clip_pkl,
                                           interval=interval)
    return {
        "img_dir": img_root, "seg_dir": seg_root,
        "n_train_clips": len(out["train"]), "n_val_clips": len(out["val"]),
    }


def run_cli(root: str, fix: dict, split: str, bs: int, epochs: int,
            interval: int, extra: list, timeout=1500, hw=(128, 128),
            sub_extra: list = ()):
    # `extra` are GLOBAL flags (must precede the subcommand); `sub_extra`
    # are INTER-subparser flags
    env = dict(os.environ, DVIE_DATA_ROOT=root)
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--dataset", "cityscape", "--split", split,
        "--img_dir", fix["img_dir"], "--seg_dir", fix["seg_dir"],
        "--input_h", str(hw[0]), "--input_w", str(hw[1]),
        "--bs", str(bs), "--epochs", str(epochs),
        "--interval", str(interval), "--nw", "2",
        "--disp_interval", "2",
        "--save_dir", os.path.join(root, "log"),
        "--syn_type", "inter",
    ] + list(extra) + [
        "INTER", "--model", "InterNet", "--train_coarse",
    ] + list(sub_extra)
    t0 = time.time()
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=timeout, cwd=REPO)
    return res, time.time() - t0


def parse_losses(log_text: str):
    """Pull the per-display 'loss_all' series from the train log."""
    # runner.py logs "[epoch  N][iter  M] loss: X, load: Ys, comp: Zs"
    vals = [float(m) for m in re.findall(r"loss:\s*([0-9.]+),", log_text)]
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--interval", type=int, default=3)
    ap.add_argument("--hw", type=str, default="128,128")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", default="docs/SMOKE_E2E_r3.json")
    args = ap.parse_args()

    hw = tuple(int(v) for v in args.hw.split(","))
    root = tempfile.mkdtemp(prefix="dvie_smoke_")
    report = {}
    try:
        fix = build_fixture(root, interval=args.interval)
        report["fixture"] = {k: fix[k] for k in
                             ("n_train_clips", "n_val_clips")}

        # -- train ------------------------------------------------------
        res, wall = run_cli(root, fix, "train", args.bs, args.epochs,
                            args.interval, [], hw=hw)
        text = res.stdout + res.stderr
        losses = parse_losses(text)
        loads = [float(m) for m in re.findall(r"load:\s*([0-9.]+)s", text)]
        comps = [float(m) for m in re.findall(r"comp:\s*([0-9.]+)s", text)]
        exp_dirs = sorted(
            d for d in os.listdir(os.path.join(root, "log"))
            if os.path.isdir(os.path.join(root, "log", d)))
        ckpts = []
        if exp_dirs:
            cdir = os.path.join(root, "log", exp_dirs[-1], "checkpoint")
            if os.path.isdir(cdir):
                ckpts = sorted(os.listdir(cdir))
        ok_train = (res.returncode == 0 and len(losses) >= 4
                    and np.mean(losses[-3:]) < np.mean(losses[:3])
                    and len(ckpts) > 0)
        report["train"] = {
            "rc": res.returncode, "wall_s": round(wall, 1),
            "loss_first3": [round(v, 4) for v in losses[:3]],
            "loss_last3": [round(v, 4) for v in losses[-3:]],
            "n_loss_points": len(losses),
            "n_checkpoints": len(ckpts),
            "ckpt_example": ckpts[-1] if ckpts else None,
            "load_s_sum": round(sum(loads), 2),
            "comp_s_sum": round(sum(comps), 2),
            "ok": bool(ok_train),
        }
        if not ok_train:
            report["train"]["stderr_tail"] = text.strip().splitlines()[-12:]
            raise SystemExit(json.dumps(report)[:4000])

        # -- val (resume from the trained checkpoint) ---------------------
        load_dir = os.path.join(root, "log", exp_dirs[-1])
        res, wall = run_cli(
            root, fix, "val", args.bs, args.epochs, args.interval,
            ["--load_dir", load_dir, "--checkepoch", str(args.epochs),
             "--checksession", "0"],
            hw=hw, sub_extra=["--load_coarse"])
        text = res.stdout + res.stderr
        m = re.findall(r"psnr[:=]?\s*([0-9.]+)", text)
        report["val"] = {
            "rc": res.returncode, "wall_s": round(wall, 1),
            "psnr": float(m[-1]) if m else None,
            "ok": bool(res.returncode == 0 and m),
        }
        if not report["val"]["ok"]:
            report["val"]["stderr_tail"] = text.strip().splitlines()[-12:]

        # -- cycgen -------------------------------------------------------
        res, wall = run_cli(
            root, fix, "cycgen", args.bs, args.epochs, args.interval,
            ["--load_dir", load_dir, "--checkepoch", str(args.epochs),
             "--checksession", "0"],
            hw=hw, sub_extra=["--load_coarse"])
        text = res.stdout + res.stderr
        pngs = []
        for exp in sorted(os.listdir(os.path.join(root, "log"))):
            croot = os.path.join(root, "log", exp, "cycgen")
            for dirpath, _, files in os.walk(croot):
                pngs += [os.path.join(dirpath, f) for f in files
                         if f.endswith(".png")]
        report["cycgen"] = {
            "rc": res.returncode, "wall_s": round(wall, 1),
            "n_pngs": len(pngs),
            "ok": bool(res.returncode == 0 and pngs),
        }
        if not report["cycgen"]["ok"]:
            report["cycgen"]["stderr_tail"] = text.strip().splitlines()[-12:]

        report["ok"] = all(report[s]["ok"] for s in
                           ("train", "val", "cycgen"))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)
        else:
            report["root"] = root

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
