"""Train state with per-submodel optimizers.

The reference builds one torch optimizer per submodel (Adamax for
generators, Adam for discriminators) and steps each behind its
``train_*`` flag (runners/InterTrainer.py:79-83,433-439;
runners/InterGANTrainer.py:106-116,444-456).  Here each top-level params
subtree ('coarse_model', 'refine_model', ...) gets its own optax chain;
subtrees whose flag is off are frozen (no grads applied), mirroring the
reference's requires_grad gating (InterTrainer.py:46-51).

Everything lives in one flax PyTree dataclass so the whole update is a
single jitted function; under a sharded mesh the state is replicated and
gradients are reduced by XLA via the sharded-batch loss mean.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from deep_video_interpolation_extrapolation_tpu.core.config import Config


def _flat_opt(params_subtree: Any) -> bool:
    """True when this submodel's optimizer state should live as ONE flat
    vector per moment instead of a per-leaf pytree.

    Why: Adamax/Adam/SGD are elementwise, so the math is bit-identical
    either way — but per-leaf states make XLA emit one small f32 fusion
    per parameter tensor.  The r4 train-step trace (128x128 bs32 recipe)
    measured those at 13.8 ms/step — 10% of the whole step — at ~0.23 ms
    per fusion for work that is pure streaming (~0.3 ms at HBM speed for
    the full 9.9M-param set).  Raveling grads/moments into one vector
    turns the update into a handful of large streaming fusions; only the
    final per-leaf ``+ update`` (a slice each) stays small.

    MEASURED REFUTATION (r4, real chip): 7.083 vs 7.130 steps/s at the
    128x128 bs32 recipe — the per-leaf update fusions disappear from the
    trace but their 13.8 ms reappears in the ravel/unravel glue
    (itemized 139.5 vs 137.5 ms/iter); the cost is the f32 state's HBM
    round-trip, not the op count.  Default OFF (DVIE_FLAT_OPT=1 opts in;
    the math is bit-identical either way — pinned by
    tests/test_train.py::TestFlatOptimizer).

    Requires a uniform leaf dtype (``ravel_pytree`` would silently promote
    mixed dtypes); non-uniform subtrees keep the per-leaf path.
    """
    if os.environ.get("DVIE_FLAT_OPT", "0") != "1":
        return False
    leaves = jax.tree_util.tree_leaves(params_subtree)
    return bool(leaves) and all(
        getattr(l, "dtype", None) == leaves[0].dtype for l in leaves)


def make_tx(opt_name: str, lr: float) -> optax.GradientTransformation:
    """torch-default-matching optimizers (Adamax/Adam betas=(0.9,0.999),
    eps=1e-8; SGD plain).

    Constant LR is reference-faithful: ``--lr_decay_step/--lr_decay_gamma``
    are parsed but consumed NOWHERE in the reference either (grep: the
    flags appear only in options/options.py:73-78 and base_options.py;
    no runner builds a scheduler) — the flags stay accepted-and-inert
    here for CLI parity."""
    if opt_name == "adamax":
        return optax.adamax(lr, b1=0.9, b2=0.999, eps=1e-8)
    if opt_name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if opt_name == "sgd":
        return optax.sgd(lr)
    raise KeyError(opt_name)


def submodel_specs(cfg: Config) -> Dict[str, Tuple[str, float, bool]]:
    """Map params-subtree name -> (optimizer, lr, train_flag).

    Matches the reference's optimizer table:
    - coarse: Adamax(coarse_lr)            InterTrainer.py:79
    - refine: Adamax(refine_lr)            InterTrainer.py:81
    - stage3: Adamax(refine_lr)            InterTrainer.py:83 (reuses refine lr)
    - inpaint: per-flag optimizer          ExtraTrainer
    - track_gen: Adamax(coarse_lr), stepped with coarse
                                            InterGANTrainer.py:108,452
    - discs: Adam(their lr)                InterGANTrainer.py:110-116
    """
    specs: Dict[str, Tuple[str, float, bool]] = {
        "coarse_model": (cfg.coarse_optimizer, cfg.coarse_learning_rate, cfg.train_coarse),
    }
    if cfg.model in ("InterRefineNet", "InterStage3Net"):
        specs["refine_model"] = (cfg.refine_optimizer, cfg.refine_learning_rate, cfg.train_refine)
    if cfg.model == "InterStage3Net":
        specs["stage3_model"] = (cfg.refine_optimizer, cfg.refine_learning_rate, cfg.train_stage3)
    if cfg.model == "ExtraInpaintNet":
        specs["inpaint_model"] = (cfg.inpaint_optimizer, cfg.inpaint_learning_rate, cfg.train_inpaint)
    if cfg.model == "InterGANNet":
        if cfg.track_gen:
            specs["track_gen_model"] = ("adamax", cfg.coarse_learning_rate, cfg.train_coarse)
        if cfg.frame_disc:
            specs["frame_disc_model"] = ("adam", cfg.frame_disc_learning_rate, cfg.train_frame_disc)
        if cfg.frame_det_disc:
            specs["frame_det_disc_model"] = ("adam", cfg.frame_det_disc_learning_rate, cfg.train_frame_det_disc)
        if cfg.video_disc:
            specs["video_disc_model"] = ("adam", cfg.video_disc_learning_rate, cfg.train_video_disc)
        if cfg.video_det_disc:
            specs["video_det_disc_model"] = ("adam", cfg.video_det_disc_learning_rate, cfg.train_video_det_disc)
    return specs


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_states: Dict[str, Any]
    step: jnp.ndarray
    # frozen auxiliaries (not optimized): perceptual net params etc.
    frozen: Any = None

    def submodels(self):
        return list(self.params.keys())


def create_train_state(
    cfg: Config,
    variables: Dict[str, Any],
    frozen: Optional[Dict[str, Any]] = None,
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    specs = submodel_specs(cfg)
    opt_states = {}
    for name, (opt_name, lr, _trains) in specs.items():
        if name in params:
            tx = make_tx(opt_name, lr)
            target = (ravel_pytree(params[name])[0]
                      if _flat_opt(params[name]) else params[name])
            opt_states[name] = tx.init(target)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_states=opt_states,
        step=jnp.zeros((), jnp.int32),
        frozen=frozen or {},
    )


def apply_updates(cfg: Config, state: TrainState, grads: Any,
                  new_batch_stats: Optional[Any] = None) -> TrainState:
    """Per-submodel optimizer step with train_* gating."""
    specs = submodel_specs(cfg)
    new_params = dict(state.params)
    new_opt_states = dict(state.opt_states)
    for name, (opt_name, lr, trains) in specs.items():
        if name not in state.params or not trains:
            continue
        tx = make_tx(opt_name, lr)
        if _flat_opt(state.params[name]):
            # one flat streaming update (see _flat_opt); grads share the
            # params' tree structure, so their unravel maps updates back.
            # The params are raveled too so params-dependent transforms
            # (e.g. a future weight-decay term in make_tx) stay correct.
            flat_g, unravel = ravel_pytree(grads[name])
            flat_updates, new_opt = tx.update(
                flat_g, state.opt_states[name],
                ravel_pytree(state.params[name])[0])
            updates = unravel(flat_updates)
        else:
            updates, new_opt = tx.update(
                grads[name], state.opt_states[name], state.params[name])
        new_params[name] = optax.apply_updates(state.params[name], updates)
        new_opt_states[name] = new_opt
    return state.replace(
        params=new_params,
        opt_states=new_opt_states,
        batch_stats=new_batch_stats if new_batch_stats is not None else state.batch_stats,
        step=state.step + 1,
    )


def gan_weights_init(rng: jax.Array, params: Any) -> Any:
    """DCGAN-style init for the legacy GAN head (nets/GAN.py:32-33 applies
    utils/net_utils.py:31-37 ``weights_init`` to netG and netD).

    Re-samples every conv/convT kernel (4-D leaves named ``kernel``) from
    N(0, 0.02); BatchNorm ``scale`` from N(1, 0.02), BatchNorm ``bias`` to 0.
    Dense kernels and conv biases are untouched, exactly as the torch
    version (it only matches class names containing Conv / BatchNorm2d).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for k, (path, leaf) in zip(keys, flat):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf_name = names[-1] if names else ""
        in_bn = any("BatchNorm" in str(n) for n in names[:-1])
        if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 4:
            leaf = 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        elif in_bn and leaf_name == "scale":
            leaf = 1.0 + 0.02 * jax.random.normal(k, leaf.shape, leaf.dtype)
        elif in_bn and leaf_name == "bias":
            leaf = jnp.zeros_like(leaf)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
