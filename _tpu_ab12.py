"""highres_large A/B stage (scratch, not part of the package).

Waits for _tpu_ab11.py to drain (AB11_COMPLETE marker in /tmp/ab10.log
or its pid exiting), then measures the --highres_large 4-branch config
via tools_fwdbench.py: baseline vs DVIE_FUSED_HEAD4 vs DVIE_HL4_PACK vs
both.  One bench at a time on the one relay.

Run: nohup python _tpu_ab12.py > /tmp/ab12.out 2>&1 &  echo $! > /tmp/ab12.pid
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


def ab11_done() -> bool:
    try:
        with open(LOG) as f:
            if "AB11_COMPLETE" in f.read():
                return True
    except Exception:
        pass
    try:
        with open("/tmp/ab11.pid") as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)
        return False
    except Exception:
        return True


def run_fwdbench(tag: str, env_extra: dict) -> float | None:
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    try:
        res = subprocess.run(
            [PY, "tools_fwdbench.py", "--highres-large"],
            env=env, capture_output=True, text=True, timeout=50 * 60)
    except subprocess.TimeoutExpired:
        log(f"{tag}: TIMEOUT")
        return None
    dt = time.time() - t0
    for line in reversed(res.stdout.strip().splitlines()):
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
    while not ab11_done():
        time.sleep(60)
    base = run_fwdbench("HL4 baseline", {})
    h4 = run_fwdbench("HL4 FUSED_HEAD4", {"DVIE_FUSED_HEAD4": "1"})
    pk = run_fwdbench("HL4 HL4_PACK", {"DVIE_HL4_PACK": "1"})
    both = run_fwdbench("HL4 both", {"DVIE_FUSED_HEAD4": "1",
                                     "DVIE_HL4_PACK": "1"})
    log(f"HL4 FINAL base={base} head4={h4} pack={pk} both={both}")
    log("=== AB12_COMPLETE ===")


if __name__ == "__main__":
    main()
