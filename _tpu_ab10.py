"""Round-2 wrap-up TPU A/B queue (scratch, not part of the package).

/tmp was wiped between sessions, so the ab8/ab9 results are gone; the
TPU relay is back.  This stage serially measures, via bench.py children
(one at a time — concurrent runs on the one relay skew numbers 2-3x):

  1. baseline (current defaults)          — run separately before this
  2. DVIE_BB_FUSED=1                      (ops/pallas_bb.py)
  3. DVIE_AE_STEM=1                       (stem conv2 A+E)
  4. DVIE_UPSHEAD_FOLD=1                  (in-kernel 9-way shifted add)
  5. the combination of every flag that beat baseline in 2-4

plus the lane-roll probe (_probe_laneroll.py) before 4 — if the probe
fails to compile/validate, 4 is skipped (the model gate also requires
fits_fold, but the probe tells us whether the lowering is even legal).

Appends JSON-ish lines to /tmp/ab10.log.  Run:
  nohup python _tpu_ab10.py > /tmp/ab10.out 2>&1 &  echo $! > /tmp/ab10.pid
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PY = sys.executable
LOG = "/tmp/ab10.log"


def log(msg: str) -> None:
    line = f"{time.strftime('%F %T')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run_bench(tag: str, env_extra: dict) -> float | None:
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        res = subprocess.run([PY, "bench.py"], env=env, capture_output=True,
                             text=True, timeout=50 * 60)
    except subprocess.TimeoutExpired:
        log(f"{tag}: TIMEOUT")
        return None
    dt = time.time() - t0
    out = res.stdout.strip().splitlines()
    for line in reversed(out):
        try:
            d = json.loads(line)
            log(f"{tag}: fps={d['value']} ({dt:.0f}s) env={env_extra}")
            return float(d["value"])
        except Exception:
            continue
    log(f"{tag}: NO RESULT rc={res.returncode} "
        f"stderr_tail={res.stderr.strip().splitlines()[-3:]}")
    return None


def main():
    results: dict[str, float | None] = {}

    results["bb"] = run_bench("BB_FUSED", {"DVIE_BB_FUSED": "1"})
    results["stem"] = run_bench("AE_STEM", {"DVIE_AE_STEM": "1"})

    # lane-roll probe gates the fold variant
    probe_ok = False
    try:
        res = subprocess.run([PY, "_probe_laneroll.py"], capture_output=True,
                             text=True, timeout=20 * 60)
        probe_ok = res.returncode == 0 and "FAILED" not in res.stdout
        log(f"laneroll probe: ok={probe_ok}\n{res.stdout.strip()}")
    except Exception as e:
        log(f"laneroll probe: EXC {e}")
    if probe_ok:
        results["fold"] = run_bench("UPSHEAD_FOLD", {"DVIE_UPSHEAD_FOLD": "1"})
    else:
        results["fold"] = None
        log("UPSHEAD_FOLD: skipped (probe failed)")

    # baseline number is read from /tmp/bench_base_fps (written by the
    # session after the standalone baseline run)
    try:
        with open("/tmp/bench_base_fps") as f:
            base = float(f.read().strip())
    except Exception:
        base = None
    log(f"baseline={base} singles={results}")

    flags = {"bb": "DVIE_BB_FUSED", "stem": "DVIE_AE_STEM",
             "fold": "DVIE_UPSHEAD_FOLD"}
    if base is not None:
        winners = {flags[k]: "1" for k, v in results.items()
                   if v is not None and v > base + 0.15}
        if len(winners) >= 2:
            results["combo"] = run_bench(f"COMBO {sorted(winners)}", winners)
        log(f"FINAL base={base} results={results} winners={sorted(winners)}")
    log("=== AB10_COMPLETE ===")


if __name__ == "__main__":
    main()
