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


@pytest.fixture(scope="module")
def traj_gan():
    """GAN variant at 10 steps: single combined G+D backward, SN power
    iteration, VAE BN batch stats, Adamax-G/Adam-D
    (runners/InterGANTrainer.py:347-456).  128x128 (the SN disc head
    hard-codes it, nets/FrameDisc.py:147); shared fixed VAE eps."""
    argv, ref, ours, cmp_ = tp.run_variant("gan", 128, 128, 1, STEPS)
    return ref, ours, cmp_


@pytest.fixture(scope="module")
def traj_extra():
    """EXTRA variant at 10 steps: 2-step autoregressive rollout with
    argmax->one-hot seg feedback and BPTT through predicted rgb
    (runners/ExtraTrainer.py:254-323, run with its documented source
    bugs patched — tools_trajparity._EXTRA_BUG_PATCHES)."""
    argv, ref, ours, cmp_ = tp.run_variant("extra", 32, 64, 2, STEPS)
    return ref, ours, cmp_


class TestGANTrajectoryParity:
    def test_loss_curve_tracks(self, traj_gan):
        _, _, cmp_ = traj_gan
        assert cmp_["n_steps"] == STEPS
        # hinge/disc keys are trajectory-sensitive: envelope tolerances
        # (designed per VERDICT r4 #7) — tight on the total, looser on
        # the adversarial keys whose magnitudes are small differences of
        # large activations
        assert cmp_["max_rel_per_key"]["loss_all"] < 2e-2
        for key, rel in cmp_["max_rel_per_key"].items():
            assert rel < 0.35, (key, rel)

    def test_final_weights_track(self, traj_gan):
        """The strongest oracle: post-training weights, ported leaf for
        leaf.  Pins the combined backward, both optimizers, SN u-vector
        evolution, and BN running stats over the run."""
        _, _, cmp_ = traj_gan
        fp = cmp_["final_params"]
        assert fp["frame_disc_model"]["rel_l2"] < 2e-2, fp
        assert fp["frame_disc_sn_u"]["rel_l2"] < 5e-2, fp
        assert fp["coarse_model_bn_stats"]["rel_l2"] < 2e-2, fp
        # BN scale/bias have structurally near-zero gradients (Adamax
        # turns cross-framework f32 noise on them into full-lr steps in
        # arbitrary directions; tools_trajparity.compare_final_params).
        # The generator drifts fastest (adversarial dynamics amplify f32
        # noise; calibration run measured ex-bn rel_l2 = 0.058 at these
        # 10 steps with the loss curves agreeing to 1.4%) — threshold at
        # ~2x the measured level
        assert fp["coarse_model"]["rel_l2_ex_bn"] < 0.12, fp

    def test_gan_losses_descend_both_sides(self, traj_gan):
        ref, ours, _ = traj_gan
        assert ref["steps"][-1]["loss_all"] < ref["steps"][0]["loss_all"]
        assert ours["steps"][-1]["loss_all"] < ours["steps"][0]["loss_all"]


class TestExtraTrajectoryParity:
    def test_loss_curve_tracks(self, traj_extra):
        _, _, cmp_ = traj_extra
        assert cmp_["n_steps"] == STEPS
        for key, rel in cmp_["max_rel_per_key"].items():
            assert rel < 5e-3, (key, rel)

    def test_final_weights_track(self, traj_extra):
        _, _, cmp_ = traj_extra
        assert cmp_["final_params"]["coarse_model"]["rel_l2"] < 2e-2


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
