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
