"""Second-stage TPU measurement supervisor (scratch, not part of the package).

_tpu_ab8.py probes with a 20 h budget (ends ~08:00 Aug 19).  The relay
outage that started ~23:55 Aug 17 is still total ~21 h in, so ab8 may
exhaust its budget before the relay returns.  This stage waits for ab8
to drain (completion marker or process exit), then re-runs every
measurement that is still missing with a much longer budget, plus:

- the x0-unpack Mosaic probes (_probe_x0unpack.py) that decide whether
  upshead can consume branch-0 in its packed HWNC producer form
  (kills the 3.1 ms copy.527) without a full kernel restructure;
- a combined-winners bench (BB_FUSED + AE_STEM + UPSHEAD_FOLD) so the
  best default set has a measured number even if the singles land late.

Run: nohup python _tpu_ab9.py &   (appends to /tmp/tpu_queue.log)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import _tpu_ab8 as ab8

PY = sys.executable


def ab8_alive() -> bool:
    """True while the ab8 supervisor process exists.

    /tmp/ab8.pid is written by the launcher (nohup ... & echo $! >
    /tmp/ab8.pid), not by _tpu_ab8.py itself — if the file is missing we
    conservatively report ALIVE so two supervisors never run benches
    concurrently on the one relay (concurrent runs skew numbers 2-3x);
    the AB8_COMPLETE marker or the 22 h cap still unblocks us.
    """
    try:
        with open("/tmp/ab8.pid") as f:
            pid = int(f.read().strip())
    except Exception:
        return True  # unknown -> assume alive (see docstring)
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def main() -> None:
    # 1. wait for ab8 to drain: completion marker, process exit, or cap
    cap = time.monotonic() + 22 * 3600
    while time.monotonic() < cap:
        if "AB8_COMPLETE" in ab8.read_log() or not ab8_alive():
            break
        time.sleep(120)
    ab8.log_append(f"=== AB9 supervisor start {time.strftime('%F %T')} ===")

    fwd = [PY, "tools_fwdbench.py", "--bs", "4", "--highres-large"]
    jobs = [
        ("bench HEAD*", '"vs_baseline"', [PY, "bench.py"], {}),
        ("bs=1", "fps", [PY, "tools_fwdbench.py", "--bs", "1"], {}),
        ("bs=12", "fps", [PY, "tools_fwdbench.py", "--bs", "12"], {}),
        ("bs=16", "fps", [PY, "tools_fwdbench.py", "--bs", "16"], {}),
        ("DVIE_BB_FUSED=1", '"vs_baseline"', [PY, "bench.py"],
         {"DVIE_BB_FUSED": "1"}),
        ("DVIE_AE_STEM=1", '"vs_baseline"', [PY, "bench.py"],
         {"DVIE_AE_STEM": "1"}),
        ("DVIE_BB_FUSED=1 DVIE_AE_STEM=1", '"vs_baseline"', [PY, "bench.py"],
         {"DVIE_BB_FUSED": "1", "DVIE_AE_STEM": "1"}),
        ("AB3 laneroll*", "ROLL3D+SLICE: compiled",
         [PY, "_probe_laneroll.py"], {}),
        ("AB9 x0unpack probe", "HWNC_BLOCKSPEC:",
         [PY, "_probe_x0unpack.py"], {}),
        ("AB5 trainbench 24", '"steps/sec/chip"',
         [PY, "tools_trainbench.py", "--bs", "24", "--hw", "128,128"], {}),
        ("AB5 trainbench 8", '"steps/sec/chip"',
         [PY, "tools_trainbench.py", "--bs", "8", "--hw", "512,1024"], {}),
        ("AB5 trainbench gan", '"steps/sec/chip"',
         [PY, "tools_trainbench.py", "--gan", "--bs", "24",
          "--hw", "128,128"], {}),
        ("DVIE_FUSED_HEAD4=0", "fps", fwd, {"DVIE_FUSED_HEAD4": "0"}),
        ("DVIE_FUSED_HEAD4=1", "fps", fwd, {"DVIE_FUSED_HEAD4": "1"}),
        ("DVIE_HL4_PACK=1", "fps", fwd, {"DVIE_HL4_PACK": "1"}),
        ("DVIE_HL4_PACK=1 DVIE_FUSED_HEAD4=1", "fps", fwd,
         {"DVIE_HL4_PACK": "1", "DVIE_FUSED_HEAD4": "1"}),
        ("AB8 upshead tile sweep", "8,128,2 ->",
         [PY, "_ups_sweep_tmp.py"], {}),
    ]
    legacy_ok = {
        "AB5 trainbench 24": '"config": "bs24_128x128',
        "AB5 trainbench 8": '"config": "bs8_512x1024',
        "AB5 trainbench gan": '_gan"',
    }

    deadline = time.monotonic() + 26 * 3600
    for key, success, argv, env in jobs:
        done = ab8.have_result(key, success)
        if not done and key in legacy_ok:
            done = (legacy_ok[key] in ab8.read_log()
                    and success in ab8.read_log())
        if done:
            continue
        if not ab8.wait_relay(deadline):
            ab8.log_append("AB9: gave up waiting for the relay")
            return
        ab8.run_logged(key, argv, env,
                       timeout=14400 if "sweep" in key else 2400)

    # FOLD bench gated on the lane-roll probe passing on hardware
    if ("ROLL3D+SLICE: compiled, correct= True" in ab8.read_log()
            and not ab8.have_result("DVIE_UPSHEAD_FOLD=1", '"vs_baseline"')):
        if ab8.wait_relay(deadline):
            ab8.run_logged("DVIE_UPSHEAD_FOLD=1", [PY, "bench.py"],
                           {"DVIE_UPSHEAD_FOLD": "1"})

    # combined-winners bench: all three pending candidates at once
    combo = "DVIE_BB_FUSED=1 DVIE_AE_STEM=1 DVIE_UPSHEAD_FOLD=1"
    if not ab8.have_result(combo, '"vs_baseline"'):
        if ab8.wait_relay(deadline):
            ab8.run_logged(combo, [PY, "bench.py"],
                           {"DVIE_BB_FUSED": "1", "DVIE_AE_STEM": "1",
                            "DVIE_UPSHEAD_FOLD": "1"})

    for tag, d, extra in (
            ("AB8 trace", "/tmp/dvie_trace_r2b", []),
            ("AB8 train trace", "/tmp/dvie_trace_train_r2", ["--train"])):
        if not (os.path.isdir(d) and os.listdir(d)):
            if ab8.wait_relay(deadline):
                ab8.run_logged(tag, [PY, "tools_trace.py", *extra,
                                     "--iters", "4", "--out", d,
                                     "--top", "60"], {}, timeout=3600)
    ab8.log_append(f"=== AB9_COMPLETE {time.strftime('%F %T')} ===")


if __name__ == "__main__":
    main()
