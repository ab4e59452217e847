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


def make_train_step(cfg: Config, model) -> Callable:
    def train_step(state: state_lib.TrainState, batch, rng):
        batch = expand_segs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, state.frozen)
        if cfg.num_pred_step > 1:
            assert cfg.num_pred_once == 1, "multi-step rollout requires num_pred_once=1 (ExtraTrainer.py:253)"

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

                out, bs_state = apply_model(
                    model, params, bs_state, x, seg, gt_rgb=gt_x, gt_seg=gt_seg,
                    # fresh noise per rollout step: the reference runs a
                    # separate forward per step, so a VAE coarse draws an
                    # independent latent each time (ExtraTrainer.py:254-310)
                    rngs={"noise": jax.random.fold_in(rng, ii)}, train=True)
                if cfg.inpaint:
                    coarse_img, coarse_seg, inpaint_mask, inpaint_img = out
                else:
                    coarse_img, coarse_seg = out
                    inpaint_img = inpaint_mask = None

                for j in range(cfg.num_pred_once):
                    prefix = f"step_{ii + 1}_frame_{j + 1}_coarse"
                    loss_dict.update(rgb_bundle(
                        cfg, coarse_img[..., 3 * j:3 * j + 3],
                        gt_x[..., 3 * j:3 * j + 3], vgg_fn, prefix))
                    if cfg.mode == "xs2xs":
                        loss_dict[prefix + "_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                            coarse_seg[..., 20 * j:20 * j + 20],
                            jnp.argmax(gt_seg[..., 20 * j:20 * j + 20], axis=-1))
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
    """Single-window val metrics (ExtraTrainer.validate semantics)."""
    def eval_step(state: state_lib.TrainState, batch, rng):
        batch = expand_segs(batch)
        x = jnp.concatenate([batch["frame1"], batch["frame2"]], axis=-1)
        seg = jnp.concatenate([batch["seg1"], batch["seg2"]], axis=-1)
        if cfg.fix_init_frames:
            x = jnp.concatenate([batch["frame2"], x], axis=-1)
            seg = jnp.concatenate([batch["seg2"], seg], axis=-1)
        gt_x = jnp.concatenate(
            [batch[f"frame{i}"] for i in range(3, 3 + cfg.num_pred_once)], axis=-1)
        gt_seg = jnp.concatenate(
            [batch[f"seg{i}"] for i in range(3, 3 + cfg.num_pred_once)], axis=-1)
        out, _ = apply_model(model, state.params, state.batch_stats, x, seg,
                             rngs={"noise": rng}, train=False)
        if cfg.inpaint:
            coarse_img, coarse_seg, inpaint_mask, inpaint_img = out
            final_img = inpaint_img
        else:
            coarse_img, coarse_seg = out
            final_img = coarse_img

        metrics = OrderedDict()
        cos = None
        if state.frozen and "vgg" in state.frozen:
            cos = make_vgg_cosine_score(
                make_vgg_module(cfg), {"params": state.frozen["vgg"]})
        for j in range(cfg.num_pred_once):
            p = normalize01(jnp.clip(final_img[..., 3 * j:3 * j + 3], -1, 1))
            g = normalize01(gt_x[..., 3 * j:3 * j + 3])
            pre = f"frame_{j + 1}_"
            metrics[pre + "l1"] = l1_loss(p, g)
            metrics[pre + "psnr"] = psnr(p, g)
            metrics[pre + "ssim"] = ssim(p, g)
            metrics[pre + "iou"] = iou_accuracy(
                jnp.argmax(coarse_seg[..., 20 * j:20 * j + 20], axis=-1),
                jnp.argmax(gt_seg[..., 20 * j:20 * j + 20], axis=-1))
            if cos is not None:
                metrics[pre + "vgg"] = cos(p, g)
        return metrics

    return eval_step
