"""Peak-HBM regression pins for the full-res training configs.

The flagship full-res fits are razor-thin (bs2 InterNet: 15.742 of
15.75 GiB at round 3) and nothing used to pin them — any innocuous
change could silently re-OOM 512x1024 training.  These tests compile
(without executing) the exact `tools_trainbench` loop per config in a
SUBPROCESS with the TPU env restored (the suite's conftest re-execs
pytest with JAX_PLATFORMS=cpu, which children inherit) and assert the
compiler's own memory analysis stays under the v5e HBM budget.

TPU-only + slow: each case is a full-res AOT compile (~minutes through
the relay).  Run explicitly:
    python -m pytest tests/test_mem_budget.py -q
"""

import json
import os
import re
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.slow]

HBM_BUDGET_GIB = 15.75

# (args, label, budget_gib) — the three full-res --remat recipes
# TRAINBENCH_r3 proved fit, incl. the full-res extrapolation BPTT
# rollout.  Budgets are per-config pins set just above the r4 measured
# peaks (inter 13.94 / gan 15.624 / extra 15.073 GiB,
# docs/TRAINBENCH_r4.md) so a regression is caught well before the
# 15.75 GiB hardware cliff — the r4 head-backward episode showed a
# single bwd-schedule change can move a peak by ±1.8 GiB.
CONFIGS = [
    (["--bs", "2", "--hw", "512,1024", "--remat"], "inter_bs2", 14.5),
    (["--bs", "1", "--hw", "512,1024", "--remat", "--gan"], "gan_bs1",
     15.7),
    (["--bs", "1", "--hw", "512,1024", "--remat", "--extra", "2"],
     "extra_bs1", 15.4),
]


def _tpu_env() -> dict:
    """Child env with the conftest's CPU pin removed."""
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "_DVIE_TEST_REEXEC"):
        env.pop(k, None)
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   flags).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def _tpu_available() -> bool:
    """Probe in a SUBPROCESS: the in-process backend is the conftest CPU."""
    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=180, env=_tpu_env())
        return res.stdout.strip().endswith("tpu")
    except Exception:
        return False


@pytest.fixture(scope="module")
def tpu():
    if not _tpu_available():
        pytest.skip("needs the TPU compiler")


@pytest.mark.parametrize("args,label,budget", CONFIGS,
                         ids=[c[1] for c in CONFIGS])
def test_fullres_train_peak_hbm_under_budget(args, label, budget, tpu):
    out = subprocess.run(
        [sys.executable, "tools_trainbench.py", "--mem-only", *args],
        capture_output=True, text=True, timeout=1500, env=_tpu_env())
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["total_gib"] <= min(budget, HBM_BUDGET_GIB), (label, rec)
