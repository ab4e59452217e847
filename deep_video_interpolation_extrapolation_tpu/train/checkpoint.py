"""Checkpoint save/load with per-submodel granularity.

Reference: rank-0 per-epoch ``torch.save`` of {session, epoch, per-submodel
state+optimizer dicts} named ``<model>_<mode>_<syn_type>_<session>_<epoch>_
<step>.pth`` under ``<exp>/checkpoint/`` (runners/InterTrainer.py:867-886),
with selective merge-loading via ``--load_coarse/--load_refine/...``
(InterTrainer.py:889-960).

TPU-native: orbax PyTree checkpointing; the directory name keeps the
reference's filename contract.  Selective load merges chosen submodel
subtrees (params + opt state) into an existing state — same semantics as
the reference's partial ``load_state_dict`` merge.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from jax.flatten_util import ravel_pytree

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.train.state import TrainState


def _is_flat_layout(opt_state) -> bool:
    """True when an optimizer state uses the DVIE_FLAT_OPT raveled layout
    (moment leaves are single 1-D vectors rather than per-param pytrees).

    Observable from the state itself: any non-scalar leaf of a flat
    Adamax/Adam state is 1-D, while per-leaf states carry the params'
    own (2-D/4-D) tensors.  Recorded in the checkpoint payload so a
    resume under the other DVIE_FLAT_OPT value converts instead of
    failing at the first tx.update.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(opt_state)
              if getattr(l, "ndim", 0) > 0]
    return bool(leaves) and all(l.ndim == 1 for l in leaves)


def checkpoint_name(cfg: Config, epoch: int, step: int) -> str:
    return f"{cfg.model}_{cfg.mode}_{cfg.syn_type}_{cfg.session}_{epoch}_{step}"


def checkpoint_dir(base_dir: str) -> str:
    return os.path.join(base_dir, "checkpoint")


def save_checkpoint(cfg: Config, base_dir: str, state: TrainState,
                    epoch: int, step: int) -> str:
    if jax.process_index() != 0:
        return ""
    path = os.path.abspath(
        os.path.join(checkpoint_dir(base_dir), checkpoint_name(cfg, epoch, step)))
    ckpt = {
        "session": cfg.session,
        "epoch": epoch + 1,
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_states": jax.device_get(state.opt_states),
        "opt_flat": {name: _is_flat_layout(s)
                     for name, s in state.opt_states.items()},
        "step": int(state.step),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)
    return path


def load_checkpoint(path: str):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def _restructure(target, restored):
    """Rebuild ``restored`` (an orbax raw restore: namedtuples flattened
    to field-keyed dicts, tuples to lists or index-keyed dicts) in the
    structure of ``target``.

    PyTreeCheckpointer.restore without a target loses optax's container
    types; merging a dict-shaped opt state into TrainState.opt_states made
    the first resumed train step fail on ``state.mu`` attribute access.
    Field-name (not order) matching keeps it robust to dict key sorting.
    """
    if restored is None:
        # orbax collapses leafless containers (optax EmptyState, empty
        # dicts) to None on save; keep the target's container
        return target if not jax.tree_util.tree_leaves(target) else restored
    if isinstance(target, tuple) and hasattr(target, "_fields"):  # namedtuple
        if isinstance(restored, dict):
            # a field absent from the checkpoint (e.g. an optax version
            # bump added a state field since the save) keeps the target's
            # freshly-initialized value — same graceful-merge semantics
            # as the plain-dict branch below
            return type(target)(**{
                f: (_restructure(getattr(target, f), restored[f])
                    if f in restored else getattr(target, f))
                for f in target._fields})
        if isinstance(restored, (list, tuple)):
            return type(target)(*[
                _restructure(t, r) for t, r in zip(target, restored)])
    if isinstance(target, (list, tuple)):
        if isinstance(restored, dict):  # tuples stored as {'0': ..., '1': ...}
            seq = [_restructure(t, restored[str(i)])
                   if str(i) in restored else t
                   for i, t in enumerate(target)]
        elif isinstance(restored, (list, tuple)) and len(restored) == len(target):
            seq = [_restructure(t, r) for t, r in zip(target, restored)]
        else:
            return restored
        return tuple(seq) if isinstance(target, tuple) else seq
    if isinstance(target, dict) and isinstance(restored, dict):
        return {k: (_restructure(target[k], restored[k])
                    if k in restored else target[k]) for k in target}
    return restored


def _match_opt_layout(target, restored):
    """Convert a restored optimizer state between the flat (DVIE_FLAT_OPT)
    and per-leaf layouts so it matches ``target``'s layout.

    After ``_restructure`` a layout mismatch surfaces as a namedtuple
    field where one side is a single 1-D vector and the other a pytree of
    per-param tensors with the same total size; Adamax/Adam/SGD are
    elementwise, so raveling/unraveling the moments is exact.  A no-op
    when layouts already agree.
    """
    t_container = isinstance(target, (dict, list, tuple))
    r_container = isinstance(restored, (dict, list, tuple))
    if not t_container and not r_container:
        return restored
    if t_container and not r_container:
        # flat checkpoint vector -> per-leaf live layout
        flat_t, unravel = ravel_pytree(target)
        arr = jnp.asarray(restored) if restored is not None else None
        if arr is not None and arr.ndim == 1 and arr.size == flat_t.size:
            return unravel(arr)
        return restored
    if not t_container and r_container:
        # per-leaf checkpoint pytree -> flat live layout
        flat_r, _ = ravel_pytree(restored)
        if getattr(target, "ndim", None) == 1 and flat_r.size == target.size:
            return flat_r.astype(target.dtype)
        return restored
    if isinstance(target, tuple) and hasattr(target, "_fields") \
            and type(restored) is type(target):
        return type(target)(*[
            _match_opt_layout(getattr(target, f), getattr(restored, f))
            for f in target._fields])
    if isinstance(target, dict) and isinstance(restored, dict):
        return {k: (_match_opt_layout(target[k], restored[k])
                    if k in restored else v) for k, v in target.items()}
    if isinstance(target, (list, tuple)) and isinstance(restored, (list, tuple)) \
            and len(target) == len(restored):
        seq = [_match_opt_layout(t, r) for t, r in zip(target, restored)]
        return tuple(seq) if isinstance(target, tuple) else seq
    return restored


def selective_load(state: TrainState, ckpt, submodels: Optional[Iterable[str]] = None,
                   load_opt: bool = True) -> TrainState:
    """Merge chosen submodel subtrees from ``ckpt`` into ``state``.

    ``submodels=None`` loads everything present in both trees.  Optimizer
    subtrees are re-structured against the live state so optax's
    namedtuple states survive the raw orbax restore.
    """
    params = dict(state.params)
    opt_states = dict(state.opt_states)
    batch_stats = dict(state.batch_stats) if state.batch_stats else {}
    names = list(submodels) if submodels is not None else list(ckpt["params"].keys())
    for name in names:
        if name in ckpt["params"]:
            params[name] = ckpt["params"][name]
        if ckpt.get("batch_stats") and name in ckpt["batch_stats"]:
            batch_stats[name] = ckpt["batch_stats"][name]
        if load_opt and name in ckpt.get("opt_states", {}) and name in opt_states:
            opt_states[name] = _match_opt_layout(
                state.opt_states[name],
                _restructure(state.opt_states[name], ckpt["opt_states"][name]))
    return state.replace(params=params, opt_states=opt_states,
                         batch_stats=batch_stats)


def submodels_to_load(cfg: Config):
    """--load_coarse/--load_refine/... flag mapping (InterTrainer.py:889-960)."""
    sel = []
    if cfg.load_coarse:
        sel.append("coarse_model")
    if cfg.load_refine:
        sel.append("refine_model")
    if cfg.load_stage3:
        sel.append("stage3_model")
    if cfg.load_inpaint:
        sel.append("inpaint_model")
    if cfg.load_frame_disc:
        sel.append("frame_disc_model")
    if cfg.load_frame_det_disc:
        sel.append("frame_det_disc_model")
    if cfg.load_video_disc:
        sel.append("video_disc_model")
    if cfg.load_video_det_disc:
        sel.append("video_det_disc_model")
    return sel or None
