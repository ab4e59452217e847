"""Full GAN configuration: VAE coarse + TrackGenV2 + two discriminator
families (incl. the object-centric video family with sync_neg), exercising
the complete InterGANTrainer recipe (reference runners/InterGANTrainer.py)."""

import jax
import numpy as np

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data.synthetic import synthetic_batch
from deep_video_interpolation_extrapolation_tpu.train import (
    inter_gan as gan_lib,
    state as state_lib,
)

H, W, B = 16, 32, 2


def test_full_gan_step_with_tracks_and_det_disc():
    cfg = Config(
        runner="INTER", model="InterGANNet", syn_type="inter", mode="xs2xs",
        compute_dtype="float32", input_h=H, input_w=W, batch_size=B,
        coarse_model="VAEHRNet", vae=True, gan=True, train_coarse=True,
        track_gen=True, track_gen_model="TrackGenV2",
        frame_disc=True, train_frame_disc=True,
        video_det_disc=True, train_video_det_disc=True,
        video_det_disc_model="VideoSNDetDiscriminator",
        num_track_per_img=4,
    )
    batch = {k: jax.numpy.asarray(v)
             for k, v in synthetic_batch(B, H, W, seed=0).items()}
    variables = gan_lib.init_variables(cfg, jax.random.PRNGKey(0), batch)
    state = state_lib.create_train_state(cfg, variables, frozen={})
    for name in ("coarse_model", "track_gen_model", "frame_disc_model",
                 "video_det_disc_model"):
        assert name in state.params, name

    step = jax.jit(gan_lib.make_train_step(cfg))
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    expect = ("coarse_l1_loss", "coarse_kld_loss", "coarse_loc_diff_loss",
              "coarse_frame_loss", "disc_frame_real_loss",
              "coarse_video_det_loss", "disc_video_det_fake_loss", "loss_all")
    for k in expect:
        assert k in losses and np.isfinite(float(losses[k])), k
    for name in state.params:
        a = jax.tree_util.tree_leaves(state.params[name])
        b = jax.tree_util.tree_leaves(new_state.params[name])
        assert any(not np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), f"{name} did not train"
