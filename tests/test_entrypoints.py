"""Driver-contract tests: ``__graft_entry__.entry`` compiles and runs, and
``dryrun_multichip`` executes the full sharded HRNet train step on the
8-device CPU mesh.  These are the only tests exercising the real HRNet
(everything else uses tiny models); the persistent compile cache makes
repeat runs fast.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as graft  # noqa: E402


def test_entry_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    rgb, seg = out
    assert rgb.shape == (2, 64, 128, 3)
    assert seg.shape == (2, 64, 128, 20)
    assert np.all(np.isfinite(np.asarray(rgb, dtype=np.float32)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
