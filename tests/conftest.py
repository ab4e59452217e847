"""Test env: CPU backend with 8 virtual devices + persistent compile cache.

This image boots every interpreter through an axon ``sitecustomize`` that
registers (and initializes) a TPU backend before any user code runs, so
setting ``JAX_PLATFORMS``/``XLA_FLAGS`` inside conftest is too late.  The
fix: on first import, re-exec pytest once with the CPU env forced
(SURVEY.md §4: the rebuild tests the pjit data-parallel path on a faked
8-device CPU mesh).
"""

import os
import sys

if os.environ.get("_DVIE_TEST_REEXEC") != "1":
    os.environ["_DVIE_TEST_REEXEC"] = "1"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

from deep_video_interpolation_extrapolation_tpu.core.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()


# ---------------------------------------------------------------------------
# Test tiering (VERDICT r3 weak #6): a <5-minute "quick" lane covering the
# orchestration contract (CLI, options parity, losses, config/data grammar,
# one train step) so regressions are checkable on a 1-CPU rig where the full
# suite takes >19 minutes.  Everything not in QUICK_MODULES is marked slow.
# Run:  python -m pytest -m quick -q
# ---------------------------------------------------------------------------
QUICK_MODULES = {
    "test_options_parity",
    "test_losses",
    "test_cli",
    "test_smoke_fixture",
    "test_seg_ids",
}
# Individually quick tests inside otherwise-slow modules: one real train
# step + checkpoint roundtrip from test_train.
QUICK_ITEMS = {
    ("test_train", "TestInterTrainStep", "test_loss_decreases"),
    ("test_train", "TestCheckpoint", "test_roundtrip_and_selective_load"),
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__ if item.module else ""
        cls = item.cls.__name__ if item.cls else None
        name = item.originalname or item.name
        in_quick = mod in QUICK_MODULES or (mod, cls, name) in QUICK_ITEMS
        if in_quick:
            item.add_marker(_pytest.mark.quick)
        else:
            item.add_marker(_pytest.mark.slow)
