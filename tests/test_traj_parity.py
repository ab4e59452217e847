"""Training-trajectory parity vs the reference torch InterTrainer.

Runs the reference's OWN train loop (runners/InterTrainer.py:369-560, CPU
torch, infrastructure shimmed — see tools_trajparity.py) and our
train/inter.make_train_step on a shared fixture from identical ported
init weights, then asserts the per-step loss curves and end-of-run val
metrics agree.  This pins optimizer semantics (Adamax bias correction),
loss-weight integration over steps, and val-metric wiring — the
end-to-end behavior single-forward parity tests cannot see.

Slow lane (a few minutes on 1 CPU); the 100-step artifact lives in
docs/TRAJPARITY_r4.json (tools_trajparity.py).
"""

import os

import numpy as np
import pytest

import tools_trajparity as tp

pytestmark = pytest.mark.skipif(
    not os.path.isdir(tp.REF_ROOT), reason="reference tree not mounted")

STEPS = 10


@pytest.fixture(scope="module")
def traj():
    fx = tp.make_fixture(STEPS * 2, 4, 32, 64)
    argv = tp.build_argv(32, 64, 2)
    ref = tp.run_reference(argv, fx, STEPS)
    ours = tp.run_ours(argv, fx, ref["init_sd"], ref["vgg_sd"], STEPS)
    return ref, ours, tp.compare(ref, ours)


class TestTrajectoryParity:
    def test_every_step_every_loss_key(self, traj):
        _, _, cmp_ = traj
        assert cmp_["n_steps"] == STEPS
        for key, rel in cmp_["max_rel_per_key"].items():
            assert rel < 5e-3, (key, rel)

    def test_total_loss_tracks_tightly(self, traj):
        _, _, cmp_ = traj
        assert cmp_["max_rel_per_key"]["loss_all"] < 2e-3

    def test_loss_descends_like_reference(self, traj):
        ref, ours, _ = traj
        r0, rN = ref["steps"][0]["loss_all"], ref["steps"][-1]["loss_all"]
        o0, oN = ours["steps"][0]["loss_all"], ours["steps"][-1]["loss_all"]
        assert rN < r0 and oN < o0
        # same DESCENT, not just same endpoints
        assert abs((rN - r0) - (oN - o0)) / max(abs(rN - r0), 1e-6) < 0.05

    def test_val_metrics(self, traj):
        ref, ours, cmp_ = traj
        for key, rel in cmp_["val_rel"].items():
            if key == "coarse_iou":
                # near-zero denominator at random-quality segs: compare
                # absolutely (both sides' pixel accuracy on 20 classes)
                assert abs(ref["val"][key] - ours["val"][key]) < 5e-3, (
                    ref["val"][key], ours["val"][key])
            else:
                assert rel < 5e-3, (key, rel, ref["val"][key],
                                    ours["val"][key])
