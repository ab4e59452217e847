"""Interpolation trainer steps (reference runners/InterTrainer.py).

``make_train_step``/``make_eval_step`` return pure jittable functions for
the InterNet / InterRefineNet / InterStage3Net heads, reproducing the
reference's loss structure:

- coarse: weighted {l1, gdl, vgg, ssim} on raw [-1,1] outputs + CE on seg
  (InterTrainer.py:411-414);
- refine/stage3: per-scale refine-weighted bundles against align_corners
  bilinear-downscaled ground truth (InterTrainer.py:415-425);
- one summed backward, per-submodel optimizer steps gated by train_* flags
  (InterTrainer.py:427-439).

The loss-dict keys match the reference's logging keys exactly.  Metric sync
across data shards happens automatically: all reductions are global means
under jit over the sharded batch, the SPMD equivalent of
``sync``'s dist.all_reduce (InterTrainer.py:859-864).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict

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
from deep_video_interpolation_extrapolation_tpu.ops.resize import interpolate_bilinear
from deep_video_interpolation_extrapolation_tpu.train import state as state_lib
from deep_video_interpolation_extrapolation_tpu.train.common import (
    apply_model,
    get_inter_inputs,
    make_vgg_module,
    normalize01,
    rgb_bundle,
    seg_id_targets,
    sum_losses,
    vgg_loss_from_frozen,
)


def _check_vae_combo(cfg: Config) -> None:
    """VAEHRNet is supported under InterNet (gt-conditioned posterior +
    KLD, the same wiring as inter_gan/extra) and under InterGANNet; the
    refine/stage3 composites discard (mu, logvar) internally, so a VAE
    coarse there would train with an unregularized posterior — the
    reference never supported the combo either (its InterNet-family
    heads call ``coarse_model(x)`` positionally and TypeError on
    VAEHRNet's (input, gt_x, gt_seg) signature)."""
    if (cfg.coarse_model == "VAEHRNet"
            and cfg.model in ("InterRefineNet", "InterStage3Net")):
        raise ValueError(
            f"--coarse_model VAEHRNet is not supported under {cfg.model}; "
            "use --model InterNet (plain VAE) or InterGANNet (--vae)")


def make_train_step(cfg: Config, model, with_grads: bool = False) -> Callable:
    """``with_grads=True`` additionally returns the raw gradient tree —
    used by the multichip dryrun's DDP-equivalence assertion (gradients,
    unlike Adamax's sign-like first step, compare tightly across device
    counts)."""
    _check_vae_combo(cfg)

    def train_step(state: state_lib.TrainState, batch, rng):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, state.frozen)

        def fwd(params, bs, x, seg, gt_x, gt_seg, rng):
            # gt passes through to the composites (all accept gt kwargs):
            # a VAEHRNet coarse conditions its posterior on them in train
            # mode (nets/HRNet.py:968-1061)
            return apply_model(model, params, bs, x, seg,
                               gt_rgb=gt_x, gt_seg=gt_seg,
                               rngs={"noise": rng}, train=True)
        if cfg.remat:
            # --remat: rematerialize activations in backprop, trading FLOPs
            # for memory (full-res 1024x512 configs).  HRNet-family coarse
            # models checkpoint themselves at STAGE granularity
            # (models/hrnet.py _HRBackbone.remat) — that segmentation is
            # what actually lowers the backward peak; the whole-forward
            # checkpoint here is kept only for models without internal
            # segments (a nested outer region would add a third forward
            # recompute for no memory benefit).
            from deep_video_interpolation_extrapolation_tpu.models.registry import (
                remat_internal,
            )
            if not remat_internal(cfg):
                fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            out, new_bs = fwd(params, state.batch_stats, x, seg,
                              gt_x, gt_seg, rng)
            loss_dict = OrderedDict()
            mu = logvar = None
            if cfg.model == "InterNet":
                if len(out) == 4:   # VAEHRNet coarse (train mode)
                    coarse_img, coarse_seg, mu, logvar = out
                else:
                    coarse_img, coarse_seg = out
            elif cfg.model == "InterRefineNet":
                coarse_img, coarse_seg, refine_imgs = out
            else:
                coarse_img, coarse_seg, refine_imgs, stage3_imgs, _ = out

            loss_dict.update(rgb_bundle(cfg, coarse_img, gt_x, vgg_fn, "coarse"))
            if cfg.mode == "xs2xs" and coarse_seg is not None:
                loss_dict["coarse_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                    coarse_seg, seg_id_targets(batch["seg2"]))
            if mu is not None:
                from deep_video_interpolation_extrapolation_tpu.losses.vae import (
                    kld_loss,
                )
                loss_dict["coarse_kld_loss"] = kld_loss(
                    mu, logvar, cfg.kld_weight)
            if cfg.model in ("InterRefineNet", "InterStage3Net"):
                # per-scale losses keyed by each stage's ACTUAL output
                # count: SRNRefine emits n_scales scales, refineUnet one
                # full-res image (the composite normalizes it to a list)
                def per_scale(imgs, stem):
                    n_sc = len(imgs)
                    for i in range(n_sc):
                        # str(scale) is also the reference's logging-key
                        # suffix ('0.5', '1.0', ...)
                        scale = 1 / (2 ** (n_sc - i - 1))
                        gt_s = gt_x if scale == 1.0 else interpolate_bilinear(
                            gt_x, scale_factor=scale, align_corners=True)
                        loss_dict.update(rgb_bundle(
                            cfg, imgs[i], gt_s, vgg_fn,
                            stem + str(scale), refine=True))

                per_scale(refine_imgs, "refine_")
                if cfg.model == "InterStage3Net":
                    per_scale(stage3_imgs, "stage3_")
            total = sum_losses(loss_dict)
            loss_dict["loss_all"] = total
            return total, (loss_dict, new_bs)

        (_, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state_lib.apply_updates(cfg, state, grads, new_bs)
        if with_grads:
            return new_state, loss_dict, grads
        return new_state, loss_dict

    return train_step


def make_eval_step(cfg: Config, model) -> Callable:
    """Validation metrics (InterTrainer.py:612-633): L1/PSNR/SSIM on [0,1],
    IoU(=pixel acc) on argmax ids, VGG-cosine."""
    def eval_step(state: state_lib.TrainState, batch, rng):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        out, _ = apply_model(model, state.params, state.batch_stats, x, seg,
                             gt_seg=gt_seg, rngs={"noise": rng}, train=False)
        if cfg.model == "InterNet":
            coarse_img, coarse_seg = out
            refine_img = None
        elif cfg.model == "InterRefineNet":
            coarse_img, coarse_seg, refine_imgs = out
            refine_img = refine_imgs[-1]
        else:
            coarse_img, coarse_seg, refine_imgs, stage3_imgs, _ = out
            refine_img = refine_imgs[-1]
            stage3_img = stage3_imgs[-1]

        coarse_img = jnp.clip(coarse_img, -1, 1)
        metrics = OrderedDict()
        p = normalize01(coarse_img)
        g = normalize01(gt_x)
        metrics["coarse_l1"] = l1_loss(p, g)
        metrics["coarse_psnr"] = psnr(p, g)
        metrics["coarse_ssim"] = ssim(p, g)
        # IoU only when a real seg target exists: seg-free generators
        # (B2SNet; MyFRRN/PSPNet in xx2x) return coarse_seg=None, and the
        # xx2x triplet sets (ucf101/vimeo) ship all-zero dummy one-hots —
        # an 'iou' against those measures argmax-to-class-0, not accuracy
        if cfg.mode == "xs2xs" and coarse_seg is not None:
            metrics["coarse_iou"] = iou_accuracy(
                jnp.argmax(coarse_seg, axis=-1),
                seg_id_targets(batch["seg2"]))
        if state.frozen and "vgg" in state.frozen:
            cos = make_vgg_cosine_score(
                make_vgg_module(cfg), {"params": state.frozen["vgg"]})
            metrics["coarse_vgg"] = cos(p, g)
        if refine_img is not None:
            rp = normalize01(jnp.clip(refine_img, -1, 1))
            metrics["refine_l1"] = l1_loss(rp, g)
            metrics["refine_psnr"] = psnr(rp, g)
            metrics["refine_ssim"] = ssim(rp, g)
            if state.frozen and "vgg" in state.frozen:
                metrics["refine_vgg"] = cos(rp, g)
        if cfg.model == "InterStage3Net":
            # EXTENSION over the reference: its validate() never measures
            # the stage-3 output (InterTrainer.py:612-633 stops at
            # refine_*), so epoch selection was blind to the stage being
            # trained.  Same metric set, stage3_ prefix.
            sp = normalize01(jnp.clip(stage3_img, -1, 1))
            metrics["stage3_l1"] = l1_loss(sp, g)
            metrics["stage3_psnr"] = psnr(sp, g)
            metrics["stage3_ssim"] = ssim(sp, g)
            if state.frozen and "vgg" in state.frozen:
                metrics["stage3_vgg"] = cos(sp, g)
        return metrics

    return eval_step
