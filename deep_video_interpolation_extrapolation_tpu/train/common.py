"""Shared pieces of the jitted train/eval steps."""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.losses.bundles import rgb_loss_bundle
from deep_video_interpolation_extrapolation_tpu.losses.perceptual import (
    make_vgg_l1_loss,
)
from deep_video_interpolation_extrapolation_tpu.models.features import VGG19Features
from deep_video_interpolation_extrapolation_tpu.models.registry import compute_dtype


def make_vgg_module(cfg: Config) -> VGG19Features:
    return VGG19Features(dtype=compute_dtype(cfg))


def init_vgg_frozen(cfg: Config, rng) -> Dict[str, Any]:
    """Random-init frozen VGG19 params (see models/features.py docstring)."""
    vgg = make_vgg_module(cfg)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return vgg.init(rng, sample)["params"]


def init_resnet_frozen(cfg: Config, rng) -> Dict[str, Any]:
    """Random-init frozen ResNet101 variables (params + BN stats) for
    TrackObjLoss (losses.py:362-414); pretrained torchvision weights port
    via models/features.load_torch_resnet101_state when available."""
    from deep_video_interpolation_extrapolation_tpu.models.features import (
        ResNet101Features,
    )
    net = ResNet101Features(dtype=compute_dtype(cfg))
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return net.init(rng, sample, train=False)


def vgg_loss_from_frozen(cfg: Config, frozen) -> Optional[Callable]:
    if not frozen or "vgg" not in frozen:
        return None
    vgg = make_vgg_module(cfg)
    return make_vgg_l1_loss(vgg, {"params": frozen["vgg"]})


def rgb_bundle(cfg: Config, pred, gt, vgg_fn, prefix: str, refine: bool = False):
    """RGBLoss with global or refine_* weights (losses.py:228-241).

    Under ``--remat`` the whole bundle (L1 + GDL + SSIM + the 5-scale
    VGG19 tower) is one ``jax.checkpoint`` region: every output is a
    scalar, so the only saved residuals are (pred, gt) — the VGG/SSIM
    conv intermediates (the largest un-rematted region at full res once
    the backbone segments itself, models/hrnet.py) are recomputed in
    backprop instead of held across it.
    """
    if refine:
        w = (cfg.refine_l1_weight, cfg.refine_gdl_weight,
             cfg.refine_vgg_weight, cfg.refine_ssim_weight)
    else:
        w = (cfg.l1_weight, cfg.gdl_weight, cfg.vgg_weight, cfg.ssim_weight)
    fn = lambda p, g: rgb_loss_bundle(p, g, *w, vgg_fn=vgg_fn, prefix=prefix)
    if getattr(cfg, "remat", False):
        import os
        # DVIE_REMAT_BUNDLE=0 keeps the bundle un-checkpointed under
        # --remat.  Measured NEUTRAL on both axes at full-res bs2 (1.768
        # vs 1.767 steps/s, 13.94 vs 13.94 GiB peak): with
        # prevent_cse=False XLA already CSE's the recompute away, so the
        # checkpoint neither costs nor saves at that config
        # (docs/TRAINBENCH_r4.md) — kept for configs where it may bind.
        if os.environ.get("DVIE_REMAT_BUNDLE", "1") != "0":
            fn = jax.checkpoint(fn, prevent_cse=False)
    return fn(pred, gt)


def sum_losses(loss_dict: "OrderedDict[str, jnp.ndarray]") -> jnp.ndarray:
    total = jnp.zeros(())
    for v in loss_dict.values():
        total = total + jnp.mean(v)
    return total


def seg_oh(seg: jnp.ndarray) -> jnp.ndarray:
    """On-device one-hot expansion of integer seg-id maps.

    TPU-first host/device contract: the Cityscapes loader ships (B, H, W)
    uint8 class ids — 80x fewer bytes across the host->device boundary
    than the reference's f32 20-channel one-hot (folder.py:195) — and the
    expansion runs inside the jitted step where XLA fuses it into the
    consumers.  Float inputs (already one-hot: synthetic, triplet
    zero-seg, legacy callers) pass through unchanged, so both contracts
    coexist under one step signature per dtype.
    """
    if jnp.issubdtype(seg.dtype, jnp.integer):
        from deep_video_interpolation_extrapolation_tpu.data.cityscapes import (
            N_CLASSES,
        )
        return jax.nn.one_hot(seg, N_CLASSES, dtype=jnp.float32)
    return seg


def expand_segs(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Apply ``seg_oh`` to every seg entry of a batch dict (idempotent)."""
    return {k: seg_oh(v) if k.startswith("seg") else v
            for k, v in batch.items()}


def get_inter_inputs(batch: Dict[str, jnp.ndarray]):
    """(frame1, frame3) -> predict frame2 (runners/InterTrainer.py:389-394)."""
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], axis=-1)
    seg = jnp.concatenate([seg_oh(batch["seg1"]), seg_oh(batch["seg3"])],
                          axis=-1)
    return x, seg, batch["frame2"], seg_oh(batch["seg2"])


def normalize01(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> [0,1] (runners/InterTrainer.py:129-130)."""
    return (img + 1.0) / 2.0


def seg_id_targets(seg: jnp.ndarray) -> jnp.ndarray:
    """Integer class-id CE/IoU targets from either seg contract.

    Under DVIE_SEG_IDS the loader ships (B, H, W) uint8 ids — use them
    directly instead of paying a full-res (B, H, W, 20) f32 one-hot
    materialization (seg_oh) followed by an argmax straight back to ids
    inside the hot jitted step.  Float one-hots (synthetic/legacy
    contracts) argmax as before; values are identical either way.
    """
    if jnp.issubdtype(seg.dtype, jnp.integer):
        return seg.astype(jnp.int32)
    return jnp.argmax(seg, axis=-1)


def apply_model(model, state_params, batch_stats, *args, rngs=None, train=True, **kw):
    """model.apply with optional mutable batch_stats collection."""
    variables = {"params": state_params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (train and batch_stats) else False
    out = model.apply(variables, *args, train=train, mutable=mutable,
                      rngs=rngs or {}, **kw)
    if mutable:
        out, mutated = out
        return out, mutated.get("batch_stats", batch_stats)
    return out, batch_stats
