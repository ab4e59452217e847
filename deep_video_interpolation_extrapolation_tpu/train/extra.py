"""Extrapolation trainer steps (reference runners/ExtraTrainer.py).

Autoregressive rollout over ``num_pred_step`` steps, each predicting
``num_pred_once`` frames (ExtraTrainer.py:254-310): the window slides by
feeding predicted rgb back directly (BPTT through the rollout, as in the
reference where predictions are not detached) and predicted seg via
argmax -> one-hot (non-differentiable, ExtraTrainer.py:306-310).

Reference bugs fixed (SURVEY §2.7): the rollout feedback uses
``inpaint_img``/``coarse_img``/``coarse_seg`` (the reference references
undefined ``inpainted_img/out_img/out_seg`` at ExtraTrainer.py:306-310),
and the masked inpaint RGB bundle is computed inline (the reference passes
a ``mask=`` kwarg RGBLoss does not accept, ExtraTrainer.py:297).

The rollout is a static Python loop: ``num_pred_step`` is a config
constant, every iteration has identical shapes, and XLA compiles it once.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.losses.image import (
    cross_entropy_loss,
    iou_accuracy,
    l1_loss,
    psnr,
    ssim,
)
from deep_video_interpolation_extrapolation_tpu.losses.perceptual import (
    make_vgg_cosine_score,
)
from deep_video_interpolation_extrapolation_tpu.train import state as state_lib
from deep_video_interpolation_extrapolation_tpu.train.common import (
    apply_model,
    expand_segs,
    make_vgg_module,
    normalize01,
    rgb_bundle,
    seg_id_targets,
    sum_losses,
    vgg_loss_from_frozen,
)


def _one_hot_from_logits(seg_logits: jnp.ndarray, n: int = 20) -> jnp.ndarray:
    # gather-from-eye instead of eq-based one_hot: the eq/select lowering
    # feeds the next step's convs and trips a SpaceToBatchConverter
    # backprop-filter bug in the current libtpu (select shape check abort);
    # a gather produces identical values without the select.
    ids = jnp.argmax(seg_logits, axis=-1)
    return jnp.take(jnp.eye(n, dtype=seg_logits.dtype), ids, axis=0)


def _check_mode(cfg: Config) -> None:
    """Extrapolation is xs2xs-only: the reference's xx2x branch is dead
    code (``seg`` is unbound under xx2x -> NameError at
    ExtraTrainer.py:265/275), and a seg-free rollout here would quietly
    condition every step on an untrained seg head's argmax — fail loudly
    instead (the framework convention for silently-degenerate configs)."""
    if cfg.mode != "xs2xs":
        raise ValueError(
            f"EXTRA supports --mode xs2xs only (got {cfg.mode!r}); the "
            "reference's xx2x extrapolation path was never functional")


def make_train_step(cfg: Config, model) -> Callable:
    _check_mode(cfg)

    def train_step(state: state_lib.TrainState, batch, rng):
        # CE targets come from the RAW seg entries (uint8 ids under
        # DVIE_SEG_IDS — no one-hot->argmax round trip; XLA then DCEs the
        # unused target one-hots for non-gt-consuming models)
        raw_segs = {k: v for k, v in batch.items() if k.startswith("seg")}
        batch = expand_segs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, state.frozen)
        if cfg.num_pred_step > 1:
            assert cfg.num_pred_once == 1, "multi-step rollout requires num_pred_once=1 (ExtraTrainer.py:253)"

        def fwd(params, bs, x, seg, gt_x, gt_seg, key):
            return apply_model(
                model, params, bs, x, seg, gt_rgb=gt_x, gt_seg=gt_seg,
                rngs={"noise": key}, train=True)
        if cfg.remat:
            # --remat: rematerialize each rollout forward in backprop —
            # BPTT through num_pred_step windows multiplies activation
            # memory, so this is the path that needs it most (same knob
            # as inter.py).  When the coarse model remats itself at stage
            # granularity (models/hrnet.py _HRBackbone.remat) the
            # per-rollout outer checkpoint is redundant: each stage
            # segment already bounds the live set, and its boundaries are
            # exactly what the rollout would re-save.
            from deep_video_interpolation_extrapolation_tpu.models.registry import (
                remat_internal,
            )
            if not remat_internal(cfg):
                fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            loss_dict = OrderedDict()
            bs_state = state.batch_stats
            last_rgb = jnp.concatenate([batch["frame1"], batch["frame2"]], axis=-1)
            last_seg = jnp.concatenate([batch["seg1"], batch["seg2"]], axis=-1)
            for ii in range(cfg.num_pred_step):
                start = 3 + ii * cfg.num_pred_once
                gt_x = jnp.concatenate(
                    [batch[f"frame{i}"] for i in range(start, start + cfg.num_pred_once)],
                    axis=-1)
                gt_seg = jnp.concatenate(
                    [batch[f"seg{i}"] for i in range(start, start + cfg.num_pred_once)],
                    axis=-1)
                x, seg = last_rgb, last_seg
                if cfg.fix_init_frames:
                    x = jnp.concatenate([batch["frame2"], x], axis=-1)
                    seg = jnp.concatenate([batch["seg2"], seg], axis=-1)

                # fresh noise per rollout step: the reference runs a
                # separate forward per step, so a VAE coarse draws an
                # independent latent each time (ExtraTrainer.py:254-310)
                out, bs_state = fwd(params, bs_state, x, seg, gt_x, gt_seg,
                                    jax.random.fold_in(rng, ii))
                mu = logvar = None
                if cfg.inpaint:
                    coarse_img, coarse_seg, inpaint_mask, inpaint_img = out
                elif len(out) == 4:
                    # VAE coarse (a framework extension: the reference's
                    # EXTRA parser offers HRNet only) — the posterior must
                    # be KLD-regularized or the encoder smuggles gt
                    # through z and eval's prior draws are garbage
                    coarse_img, coarse_seg, mu, logvar = out
                    inpaint_img = inpaint_mask = None
                else:
                    coarse_img, coarse_seg = out
                    inpaint_img = inpaint_mask = None

                if mu is not None:
                    from deep_video_interpolation_extrapolation_tpu.losses.vae import (
                        kld_loss,
                    )
                    loss_dict[f"step_{ii + 1}_coarse_kld_loss"] = kld_loss(
                        mu, logvar, cfg.kld_weight)

                for j in range(cfg.num_pred_once):
                    prefix = f"step_{ii + 1}_frame_{j + 1}_coarse"
                    loss_dict.update(rgb_bundle(
                        cfg, coarse_img[..., 3 * j:3 * j + 3],
                        gt_x[..., 3 * j:3 * j + 3], vgg_fn, prefix))
                    loss_dict[prefix + "_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                        coarse_seg[..., 20 * j:20 * j + 20],
                        seg_id_targets(raw_segs[f"seg{start + j}"]))
                    if cfg.inpaint:
                        iprefix = f"step_{ii + 1}_frame_{j + 1}_inpaint"
                        m = inpaint_mask[..., j:j + 1]
                        loss_dict.update(rgb_bundle(
                            cfg, inpaint_img[..., 3 * j:3 * j + 3] * (1 - m),
                            gt_x[..., 3 * j:3 * j + 3] * (1 - m), vgg_fn, iprefix))
                        mask_w = 80.0 if cfg.inpaint_mask else 0.0
                        loss_dict[iprefix + "_mask_loss"] = mask_w * jnp.mean(m)

                if cfg.num_pred_step == 1:
                    break
                back_img = inpaint_img if cfg.inpaint else coarse_img
                last_rgb = jnp.concatenate([x[..., -3:], back_img], axis=-1)
                last_seg = jnp.concatenate(
                    [seg[..., -20:], _one_hot_from_logits(coarse_seg)], axis=-1)

            total = sum_losses(loss_dict)
            loss_dict["loss_all"] = total
            return total, (loss_dict, bs_state)

        (_, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state_lib.apply_updates(cfg, state, grads, new_bs)
        return new_state, loss_dict

    return train_step


def make_eval_step(cfg: Config, model) -> Callable:
    """Autoregressive val metrics (ExtraTrainer.validate,
    ExtraTrainer.py:421-546): the FULL num_pred_step rollout with the same
    prediction feedback as training, reporting per-(step, frame)
    ``step_{i}_frame_{j}_coarse_{l1,psnr,ssim,iou,vgg}`` (0-indexed, the
    reference's validate naming — its train keys are 1-indexed) plus
    ``..._inpaint_*`` when inpainting.  Coarse metrics are always
    reported; inpaint metrics are additional (ExtraTrainer.py:486-504) —
    multi-step drift is the thing this runner exists to control, so a
    single-window eval would optimize the wrong objective in checkpoint
    sweeps."""
    _check_mode(cfg)

    def eval_step(state: state_lib.TrainState, batch, rng):
        raw_segs = {k: v for k, v in batch.items() if k.startswith("seg")}
        batch = expand_segs(batch)
        if cfg.num_pred_step > 1:
            assert cfg.num_pred_once == 1, "ExtraTrainer.py:459"
        metrics = OrderedDict()
        cos = None
        if state.frozen and "vgg" in state.frozen:
            cos = make_vgg_cosine_score(
                make_vgg_module(cfg), {"params": state.frozen["vgg"]})

        def rgb_metrics(pre, img, gt):
            p = normalize01(jnp.clip(img, -1, 1))
            g = normalize01(gt)
            metrics[pre + "l1"] = l1_loss(p, g)
            metrics[pre + "psnr"] = psnr(p, g)
            metrics[pre + "ssim"] = ssim(p, g)
            if cos is not None:
                metrics[pre + "vgg"] = cos(p, g)

        last_rgb = jnp.concatenate([batch["frame1"], batch["frame2"]], axis=-1)
        last_seg = jnp.concatenate([batch["seg1"], batch["seg2"]], axis=-1)
        for ii in range(cfg.num_pred_step):
            start = 3 + ii * cfg.num_pred_once
            gt_x = jnp.concatenate(
                [batch[f"frame{i}"] for i in range(start, start + cfg.num_pred_once)],
                axis=-1)
            gt_seg = jnp.concatenate(
                [batch[f"seg{i}"] for i in range(start, start + cfg.num_pred_once)],
                axis=-1)
            x, seg = last_rgb, last_seg
            if cfg.fix_init_frames:
                x = jnp.concatenate([batch["frame2"], x], axis=-1)
                seg = jnp.concatenate([batch["seg2"], seg], axis=-1)
            out, _ = apply_model(
                model, state.params, state.batch_stats, x, seg,
                rngs={"noise": jax.random.fold_in(rng, ii)}, train=False)
            if cfg.inpaint:
                coarse_img, coarse_seg, inpaint_mask, inpaint_img = out
            else:
                coarse_img, coarse_seg = out
                inpaint_img = None

            for j in range(cfg.num_pred_once):
                pre = f"step_{ii}_frame_{j}_"
                rgb_metrics(pre + "coarse_",
                            coarse_img[..., 3 * j:3 * j + 3],
                            gt_x[..., 3 * j:3 * j + 3])
                metrics[pre + "coarse_iou"] = iou_accuracy(
                    jnp.argmax(coarse_seg[..., 20 * j:20 * j + 20], axis=-1),
                    seg_id_targets(raw_segs[f"seg{start + j}"]))
                if cfg.inpaint:
                    rgb_metrics(pre + "inpaint_",
                                inpaint_img[..., 3 * j:3 * j + 3],
                                gt_x[..., 3 * j:3 * j + 3])

            if cfg.num_pred_step == 1:
                break
            # same feedback as training (ExtraTrainer.py:536-540)
            back_img = inpaint_img if cfg.inpaint else coarse_img
            last_rgb = jnp.concatenate([x[..., -3:], back_img], axis=-1)
            last_seg = jnp.concatenate(
                [seg[..., -20:], _one_hot_from_logits(coarse_seg)], axis=-1)
        return metrics

    return eval_step
