"""End-to-end `main.py` training throughput — the REAL lifecycle number.

Every TRAINBENCH row so far is device-only (a jitted step scanned over
synthetic donated state).  This tool runs the author's 128x128 bs32
recipe (reference cmd:160-162) through the actual CLI lifecycle —
fake-Cityscapes PNG tree at the dataset's real 512x1024 storage size ->
native C++ decode (native/dvie_host.cpp) -> thread-pool loader ->
2-batch device prefetch -> jitted train step — and reports the
SUSTAINED loader-fed samples/s plus the load/comp wall split the
reference's own accounting logs (runners/InterTrainer.py:375-381 ==
train/runner.py:400-439).

Steady-state accounting: the first `--warm-steps` display blocks are
dropped (they pay the train-step/viz compiles), and the rate is
n_steps * bs / wall over the remaining blocks, wall taken from the log
record timestamps (not process wall, which includes compile).

Writes docs/E2EBENCH_r5.json and prints one JSON line.
Usage: python tools_e2ebench.py [--steps 200] [--bs 32] [--nw 4]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

_LOG_LINE = re.compile(
    r"\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})[^\]]*\]\s*\[epoch\s*(\d+)\]"
    r"\[iter\s*(\d+)\] loss: ([0-9.]+|nan|inf), load: ([0-9.]+)s, "
    r"comp: ([0-9.]+)s")


def run(steps: int, bs: int, nw: int, disp: int, keep: bool):
    import tools_smoke_e2e as smoke

    root = tempfile.mkdtemp(prefix="dvie_e2e_")
    try:
        t0 = time.time()
        fix = smoke.build_fixture(root, n_vids=16, clip_len=30,
                                  src=(512, 1024), interval=3)
        build_s = time.time() - t0
        n_train = fix["n_train_clips"]
        epochs = max(1, math.ceil((steps + 2 * disp) * bs / n_train))

        env = dict(os.environ, DVIE_DATA_ROOT=root)
        cmd = [
            sys.executable, os.path.join(REPO, "main.py"),
            "--dataset", "cityscape", "--split", "train",
            "--img_dir", fix["img_dir"], "--seg_dir", fix["seg_dir"],
            "--input_h", "128", "--input_w", "128",
            "--bs", str(bs), "--epochs", str(epochs),
            "--interval", "3", "--nw", str(nw),
            "--disp_interval", str(disp),
            "--save_dir", os.path.join(root, "log"),
            "--syn_type", "inter",
            "INTER", "--model", "InterNet", "--train_coarse",
        ]
        t0 = time.time()
        res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=5400, cwd=REPO)
        proc_wall = time.time() - t0
        text = res.stdout + res.stderr
        rows = []
        for m in _LOG_LINE.finditer(text):
            ts = time.mktime(time.strptime(m.group(1), "%Y-%m-%d %H:%M:%S"))
            rows.append({"ts": ts, "epoch": int(m.group(2)),
                         "iter": int(m.group(3)), "loss": float(m.group(4)),
                         "load_s": float(m.group(5)),
                         "comp_s": float(m.group(6))})
        return {
            "rc": res.returncode, "rows": rows, "proc_wall_s": proc_wall,
            "fixture_build_s": build_s, "n_train_clips": n_train,
            "epochs": epochs,
            "stderr_tail": text.strip().splitlines()[-8:]
            if res.returncode else [],
        }
    finally:
        if keep:
            print("fixture kept at", root)
        else:
            shutil.rmtree(root, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="steady-state steps to accumulate after warmup")
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--nw", type=int, default=4)
    ap.add_argument("--disp", type=int, default=2)
    ap.add_argument("--warm-steps", type=int, default=15,
                    help="display blocks worth of steps dropped as warmup")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", default="docs/E2EBENCH_r5.json")
    args = ap.parse_args()

    r = run(args.steps, args.bs, args.nw, args.disp, args.keep)
    rows = r["rows"]
    warm_blocks = max(1, args.warm_steps // args.disp)
    steady = rows[warm_blocks:]
    result = {
        "config": {"bs": args.bs, "hw": [128, 128], "nw": args.nw,
                   "disp_interval": args.disp, "steps_total":
                   len(rows) * args.disp, "steady_blocks": len(steady),
                   "src_hw": [512, 1024]},
        "rc": r["rc"], "proc_wall_s": round(r["proc_wall_s"], 1),
        "n_train_clips": r["n_train_clips"], "epochs": r["epochs"],
    }
    if r["rc"] == 0 and len(steady) >= 3:
        wall = steady[-1]["ts"] - steady[0]["ts"]
        n_steps = (len(steady) - 1) * args.disp
        load = sum(b["load_s"] for b in steady[1:])
        comp = sum(b["comp_s"] for b in steady[1:])
        result.update({
            "sustained_samples_per_s": round(n_steps * args.bs / wall, 1)
            if wall > 0 else None,
            "sustained_steps_per_s": round(n_steps / wall, 3)
            if wall > 0 else None,
            "steady_wall_s": round(wall, 1),
            "load_s": round(load, 2), "comp_s": round(comp, 2),
            "load_frac": round(load / max(load + comp, 1e-9), 3),
            "loss_first": rows[0]["loss"], "loss_last": rows[-1]["loss"],
            "loss_finite": bool(np.isfinite([b["loss"] for b in rows]).all()),
        })
    else:
        result["stderr_tail"] = r["stderr_tail"]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "e2e_train_samples_per_s",
                      "value": result.get("sustained_samples_per_s"),
                      "load_frac": result.get("load_frac"),
                      "rc": r["rc"]}))


if __name__ == "__main__":
    main()
