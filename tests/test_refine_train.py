"""Train-step coverage for the refine/stage3 heads
(InterRefineNet / InterStage3Net branches of train/inter.py, mirroring
runners/InterTrainer.py:415-425 multi-scale refine losses)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data.synthetic import synthetic_batch
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.train import (
    inter as inter_lib,
    state as state_lib,
)

H, W, B = 32, 64, 1


def _cfg(**kw):
    base = dict(
        runner="INTER", syn_type="inter", mode="xs2xs", compute_dtype="float32",
        input_h=H, input_w=W, batch_size=B, dataset="synthetic",
        coarse_model="HRNet", train_coarse=True,
        refine=True, refine_model="SRNRefine", train_refine=True, n_scales=2,
    )
    base.update(kw)
    return Config(**base)


def _setup(cfg):
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(B, H, W, seed=0).items()}
    model = registry.build_model(cfg)
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, seg, train=True)
    state = state_lib.create_train_state(cfg, variables, frozen={})
    return model, state, batch


def test_refine_net_train_step():
    cfg = _cfg(model="InterRefineNet")
    model, state, batch = _setup(cfg)
    assert set(state.params.keys()) >= {"coarse_model", "refine_model"}
    step = jax.jit(inter_lib.make_train_step(cfg, model))
    new_state, losses = step(state, batch, jax.random.PRNGKey(2))
    # per-scale refine loss keys, reference naming (InterTrainer.py:415-425)
    assert "refine_0.5_l1_loss" in losses
    assert "refine_1.0_l1_loss" in losses
    assert np.isfinite(float(losses["loss_all"]))
    for name in ("coarse_model", "refine_model"):
        a = jax.tree_util.tree_leaves(state.params[name])
        b = jax.tree_util.tree_leaves(new_state.params[name])
        assert any(not np.array_equal(np.asarray(x_), np.asarray(y_))
                   for x_, y_ in zip(a, b)), name


def test_refine_unet_single_output_normalized():
    """refine_model='refineUnet' returns ONE array, not a per-scale list;
    the composite must wrap it — iterating the array would walk the BATCH
    axis and hand downstream code a (H,W,3) last-sample tensor."""
    cfg = _cfg(model="InterRefineNet", refine_model="refineUnet")
    model, state, batch = _setup(cfg)
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    _, _, refine_rgbs = model.apply(variables, x, seg, train=False)
    assert isinstance(refine_rgbs, (list, tuple)) and len(refine_rgbs) == 1
    assert refine_rgbs[0].shape == (B, H, W, 3)
    step = jax.jit(inter_lib.make_train_step(cfg, model))
    _, losses = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["loss_all"]))


def test_stage3_train_step_frozen_coarse():
    cfg = _cfg(model="InterStage3Net", stage3=True, train_stage3=True,
               stage3_model="MSResAttnRefine", train_coarse=False,
               train_refine=False)
    model, state, batch = _setup(cfg)
    assert "stage3_model" in state.params
    step = jax.jit(inter_lib.make_train_step(cfg, model))
    new_state, losses = step(state, batch, jax.random.PRNGKey(2))
    assert "stage3_1.0_l1_loss" in losses
    assert np.isfinite(float(losses["loss_all"]))
    # frozen submodels do not move; stage3 does
    for name, should_move in (("coarse_model", False),
                              ("refine_model", False),
                              ("stage3_model", True)):
        a = jax.tree_util.tree_leaves(state.params[name])
        b = jax.tree_util.tree_leaves(new_state.params[name])
        moved = any(not np.array_equal(np.asarray(x_), np.asarray(y_))
                    for x_, y_ in zip(a, b))
        assert moved == should_move, name
