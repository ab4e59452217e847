"""Legacy runner train steps (reference runners/ganer.py, VAEer.py,
trainer.py — the pre-INTER/EXTRA training loops, unreachable from the
reference's main.py but part of its runner inventory).

- ``make_gan_train_step``: the GANer recipe (ganer.py:265-410) — MyFRRN
  generator + multiscale patch discriminator, RGB bundle + CE + weighted
  patch-map GAN losses, one backward with stop_gradient routing: D's
  losses see detached fakes, and the G adversarial term runs against a
  stop_gradient'ed netD subtree (the reference's set_net_grad(netD,
  False) around pred_fake_G, nets/GAN.py:101-104) — without the second
  freeze, d(adv_loss)/dD leaks into the discriminator update.
- ``make_vae_train_step``: the VAEer recipe (VAEer.py:169-240).  The
  reference's loss call is uncallable as committed (it passes 10 args to
  the 3-arg RGBLoss, SURVEY §2.7); this implements the evident intent:
  L1 on warped + refined predictions, VGG-perceptual, KLD, and
  forward/backward flow-warp consistency.
- ``make_simple_train_step``: the plain Trainer recipe (trainer.py:254-320):
  RGB bundle + CE on a single generator.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.losses.gan import (
    bce_gan_loss,
    gan_map_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.image import (
    cross_entropy_loss,
    l1_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.vae import kld_loss
from deep_video_interpolation_extrapolation_tpu.ops.warp import backward_warp
from deep_video_interpolation_extrapolation_tpu.train import state as state_lib
from deep_video_interpolation_extrapolation_tpu.train.common import (
    get_inter_inputs,
    seg_oh,
    normalize01,
    rgb_bundle,
    seg_id_targets,
    sum_losses,
    vgg_loss_from_frozen,
)

import optax


def _single_tx_update(params, grads, opt_state, tx):
    updates, new_opt = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt


def init_gan_variables(cfg: Config, model, rng, batch) -> Dict:
    """Construct the legacy GAN head's variables the way the reference
    constructs the module: ``nets/GAN.py:32-33`` applies the DCGAN
    ``weights_init`` (utils/net_utils.py:31-37) to netG and netD right
    after building them, so Flax's default init must be re-sampled here.
    (Only this legacy head does that — InterGANNet and its discriminator
    families use default init in the reference, so ``inter_gan.
    init_variables`` deliberately does NOT apply it.)
    """
    x, seg, gt_x, gt_seg = get_inter_inputs(batch)
    init_key, w_key = jax.random.split(rng)
    variables = dict(model.init(init_key, x, seg, gt_x, gt_seg, train=True))
    variables["params"] = state_lib.gan_weights_init(
        w_key, variables["params"])
    return variables


# GANOptions defaults the reference recipe actually trains with
# (gan_options.py): --d_w 10 scales both D terms, --adv_w 1 the G
# adversarial term (the author's cmd log shows 20 in places; these are
# the parser defaults).  They are legacy-only flags, so they live here
# rather than on Config.
_GANER_D_WEIGHT = 10.0
_GANER_ADV_WEIGHT = 1.0


def make_gan_train_step(cfg: Config, model, frozen=None) -> Callable:
    """model: legacy_heads.GAN (returns fake_rgb, fake_seg, d_fake, d_real,
    g_fake).  Init variables with ``init_gan_variables`` (applies the
    reference's construction-time DCGAN weights_init, nets/GAN.py:32-33).

    Optimizers match the reference defaults: Adamax-G at --lrG, SGD
    momentum 0.9 for D at --lrD (gan_options.py:27-33, ganer.py:60-64;
    both lrs default 0.001 and map onto coarse/frame_disc lr here).
    ``frozen`` takes the VGG feature params for the RGB bundle's
    perceptual term (RGBLoss always includes vgg_weight*VGG,
    losses.py:223-241); None keeps the term zero.

    Gradient isolation matches the reference exactly: D's losses see
    detached fakes (inside the head), and the G adversarial term is
    recomputed against a stop_gradient'ed netD subtree — the functional
    analog of set_net_grad(netD, False) around pred_fake_G
    (nets/GAN.py:101-104).  Without it, d(adv_loss)/dD pushes D(fake)->1
    and corrupts the discriminator.
    """
    tx_g = state_lib.make_tx("adamax", cfg.coarse_learning_rate)
    tx_d = optax.sgd(cfg.frame_disc_learning_rate, momentum=0.9)

    def train_step(params, opt_states, batch_stats, batch, rng):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, frozen)

        def loss_fn(p):
            sg = jax.tree_util.tree_map
            p_dfrozen = dict(p)
            p_dfrozen["netD"] = sg(jax.lax.stop_gradient, p["netD"])

            def run(pp, keep_stats):
                variables = {"params": pp}
                mutable = False
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(variables, x, seg, gt_x, gt_seg,
                                  train=True, mutable=mutable)
                out, new_vars = out if mutable else (out, {})
                return out, (new_vars.get("batch_stats", batch_stats)
                             if keep_stats else None)

            # live apply: D losses + BN/stat updates
            (_, _, d_fake, d_real, _), new_bs = run(p, True)
            # netD-frozen apply: generator losses (identical forward
            # values — XLA CSEs the shared netG compute; its stat
            # mutations are the same and are dropped)
            (fake_rgb, fake_seg, _, _, g_fake), _ = run(p_dfrozen, False)

            ld = OrderedDict()
            ld.update(rgb_bundle(cfg, fake_rgb, gt_x, vgg_fn, "gen"))
            if fake_seg is not None:
                ld["gen_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                    fake_seg, seg_id_targets(batch["seg2"]))
            # patch-map GAN losses with the reference's weights and keys
            # (ganer.py:301-311)
            label_map = jnp.ones(())  # unused by the ratio-1 override
            ld["adv_loss"] = _GANER_ADV_WEIGHT * gan_map_loss(
                g_fake, label_map, True)
            ld["d_real_loss"] = _GANER_D_WEIGHT * gan_map_loss(
                d_real, label_map, True)
            ld["d_fake_loss"] = _GANER_D_WEIGHT * gan_map_loss(
                d_fake, label_map, False)
            total = sum_losses(ld)
            ld["loss_all"] = total
            return total, (ld, new_bs)

        (_, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params = dict(params)
        new_opts = dict(opt_states)
        new_params["netG"], new_opts["netG"] = _single_tx_update(
            params["netG"], grads["netG"], opt_states["netG"], tx_g)
        new_params["netD"], new_opts["netD"] = _single_tx_update(
            params["netD"], grads["netD"], opt_states["netD"], tx_d)
        return new_params, new_opts, new_bs, ld

    return train_step


def init_gan_opt_states(cfg: Config, params) -> Dict:
    return {
        "netG": state_lib.make_tx("adamax", cfg.coarse_learning_rate).init(
            params["netG"]),
        "netD": optax.sgd(cfg.frame_disc_learning_rate, momentum=0.9).init(
            params["netD"]),
    }


def make_vae_train_step(cfg: Config, model, frozen=None) -> Callable:
    """model: vae_video.VideoVAE.  Batch: rgb_seq (B,T+1,H,W,3) in [0,1],
    seg_seq one-hot, fg/bg masks.  ``frozen`` supplies the VGG features
    for the perceptual term (the reference VAE nets return
    prediction/gt VGG features for exactly this; its own loss call is
    uncallable as committed, SURVEY §2.7)."""
    tx = state_lib.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate)
    vgg_fn = vgg_loss_from_frozen(cfg, frozen)

    def train_step(params, opt_state, batch_stats, batch, rng):
        rgb_seq = batch["frames"]
        seg_seq = seg_oh(batch["segs"])
        fg = batch["fg_masks"]
        bg = batch["bg_masks"]
        gt = rgb_seq[:, 1:]

        def loss_fn(p):
            variables = {"params": p}
            mutable = False
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables, rgb_seq, seg_seq, bg, fg, train=True,
                rngs={"noise": rng}, mutable=mutable)
            (output, y_pred, mu, logvar, flow, flowback, mask_fw,
             mask_bw), new_vars = (out if mutable else (out, {}))
            ld = OrderedDict()
            ld["recon_warp_loss"] = cfg.l1_weight * l1_loss(output, gt)
            ld["recon_refine_loss"] = cfg.l1_weight * l1_loss(y_pred, gt)
            ld["kld_loss"] = kld_loss(mu, logvar, cfg.kld_weight)
            if vgg_fn is not None:
                # perceptual term over the refined sequence (the VAE nets
                # return pred/gt VGG features for this; vgg_fn expects
                # [-1,1] inputs, the VAE pipeline runs [0,1])
                t_ = gt.shape[1]
                v = sum(vgg_fn(y_pred[:, i] * 2.0 - 1.0,
                               gt[:, i] * 2.0 - 1.0) for i in range(t_))
                ld["vgg_loss"] = cfg.vgg_weight * v / t_
            # flow consistency (net_utils.warp_back semantics,
            # utils/net_utils.py:124-130): backward-warping each GT frame
            # with -flowback, masked by mask_bw, should reconstruct
            # frame1 — the gradient trains flowback/mask_bw (not y_pred)
            t = gt.shape[1]
            frame1 = rgb_seq[:, 0]
            cons = 0.0
            for i in range(t):
                back = backward_warp(gt[:, i], -flowback[:, i] * mask_bw[:, i])
                cons = cons + l1_loss(back * mask_bw[:, i],
                                      frame1 * mask_bw[:, i])
            ld["flow_consist_loss"] = 10.0 * cons / t
            total = sum_losses(ld)
            ld["loss_all"] = total
            return total, (ld, new_vars.get("batch_stats", batch_stats))

        (_, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt = _single_tx_update(params, grads, opt_state, tx)
        return new_params, new_opt, new_bs, ld

    return train_step


def _refiner_inputs(cfg: Config, batch):
    """Conditioning/target pairing per syn type (the reference Refiner
    handles both, refiner.py get_input_output): inter = (frame1, frame3)
    -> frame2; extra = (frame1, frame2) -> frame3."""
    if cfg.syn_type == "extra":
        x = jnp.concatenate([batch["frame1"], batch["frame2"]], axis=-1)
        seg = jnp.concatenate([seg_oh(batch["seg1"]), seg_oh(batch["seg2"])],
                              axis=-1)
        return x, seg, batch["frame3"], seg_oh(batch["seg3"]), "seg3"
    return (*get_inter_inputs(batch), "seg2")


def make_refiner_train_step(cfg: Config, model, frozen=None) -> Callable:
    """Legacy Refiner recipe (runners/refiner.py:398-520): coarse RGB
    bundle (+CE in xs2xs) and a multiscale refine RGB bundle against
    bilinearly downsampled gt (align_corners=True, refiner_gan.py:245),
    with per-submodel Adamax updates.

    Reference lock flags map onto our train flags: ``lock_coarse`` ==
    ``not train_coarse``, ``lock_refine``/``lock_low`` == ``not
    train_refine`` (the lock_* CLI flags no longer exist in the
    reference's options.py — dead code there; semantics preserved here).
    Reference deviation: refiner.py:85 hands the COARSE params to the
    refine optimizer in its non-adamax branch (an evident bug); each
    optimizer here owns its own submodel.

    ``model``: legacy_heads.RefineNet — (rgb, seg, gt_rgb, gt_seg, train)
    -> (coarse_rgb, out_seg, refine_rgbs) with the coarse detached from
    the refine path inside the model.
    """
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )

    tx_c = state_lib.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate)
    tx_r = state_lib.make_tx(cfg.refine_optimizer, cfg.refine_learning_rate)

    def refine_bundle(pred, gt, prefix, vgg_fn):
        from deep_video_interpolation_extrapolation_tpu.losses.bundles import (
            rgb_loss_bundle,
        )
        return rgb_loss_bundle(
            pred, gt, cfg.refine_l1_weight, cfg.refine_gdl_weight,
            cfg.refine_vgg_weight, cfg.refine_ssim_weight, vgg_fn, prefix)

    def train_step(params, opt_states, batch_stats, batch, rng):
        x, seg, gt_x, gt_seg, tgt_key = _refiner_inputs(cfg, batch)
        vgg_fn = vgg_loss_from_frozen(cfg, frozen)

        def loss_fn(p):
            variables = {"params": p}
            mutable = False
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, x, seg, gt_x, gt_seg, train=True,
                              mutable=mutable)
            out, new_vars = out if mutable else (out, {})
            if len(out) == 2:
                # extrapolation: RefineNet returns (coarse, seg) only —
                # the reference Refiner's extra branch trains the coarse
                # alone (legacy_heads.py:97-98)
                (coarse_rgb, out_seg), refine_rgbs = out, []
            else:
                coarse_rgb, out_seg, refine_rgbs = out
            if not isinstance(refine_rgbs, (list, tuple)):
                refine_rgbs = [refine_rgbs]   # single-scale refiners
            ld = OrderedDict()
            if cfg.train_coarse:
                ld.update(rgb_bundle(cfg, coarse_rgb, gt_x, vgg_fn, "coarse"))
                if cfg.mode == "xs2xs":
                    ld["coarse_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                        out_seg, seg_id_targets(batch[tgt_key]))
            if cfg.train_refine and refine_rgbs:
                for i in range(cfg.n_scales):
                    gt_i = gt_x if i == 0 else interpolate_bilinear(
                        gt_x, scale_factor=0.5 ** i, align_corners=True)
                    ld.update(refine_bundle(
                        refine_rgbs[-i - 1], gt_i, f"refine_{i}", vgg_fn))
            total = sum_losses(ld)
            ld["loss_all"] = total
            return total, (ld, new_vars.get("batch_stats", batch_stats))

        (_, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params = dict(params)
        new_opts = dict(opt_states)
        if cfg.train_coarse:
            new_params["coarse_model"], new_opts["coarse_model"] = (
                _single_tx_update(params["coarse_model"],
                                  grads["coarse_model"],
                                  opt_states["coarse_model"], tx_c))
        if cfg.train_refine:
            new_params["refine_model"], new_opts["refine_model"] = (
                _single_tx_update(params["refine_model"],
                                  grads["refine_model"],
                                  opt_states["refine_model"], tx_r))
        return new_params, new_opts, new_bs, ld

    return train_step


def init_refiner_opt_states(cfg: Config, params) -> Dict:
    return {
        "coarse_model": state_lib.make_tx(
            cfg.coarse_optimizer, cfg.coarse_learning_rate
        ).init(params["coarse_model"]),
        "refine_model": state_lib.make_tx(
            cfg.refine_optimizer, cfg.refine_learning_rate
        ).init(params["refine_model"]),
    }


def make_refiner_gan_train_step(cfg: Config, model,
                                adv_warmup_steps: int = 1000,
                                frozen=None) -> Callable:
    """Legacy RefinerGAN recipe (runners/refiner_gan.py:218-300):

    G: [coarse bundle + CE unless locked] + multiscale refine bundle +
       ``refine_adv_weight * BCE(D(fake), real)`` once ``global_step``
       passes the 1000-step warm-up (refiner_gan.py:253-267 zeroes the
       adversarial terms before that);
    D: ``refine_d_weight * (BCE(D(real), 1) + BCE(D(fake), 0))`` on the
       same schedule, optimized with SGD momentum 0.9
       (refiner_gan.py:74), while G uses Adamax.  Both optimizers run at
       the reference's GLOBAL --lr (refiner_gan.py:67,74), mapped to
       coarse_learning_rate here (same 0.001 default).  The reference's
       ``refine_adv_weight``/``refine_d_weight`` flags exist in NO
       options file (the runner would AttributeError — dead code, SURVEY
       §2.7); frame_disc_{gen,disc}_weight stand in for them.

    Single combined backward, matching the reference's alternating
    backwards exactly because of the stop_gradient routing (the same
    scheme as train/inter_gan.py): D sees detached fakes (its losses
    can't reach G), and G's adversarial term runs the discriminator with
    a stop_gradient'ed copy of the D params (it can't reach D) — the
    reference achieves the same by calling ``optD.zero_grad()`` after
    ``optG.step()``, discarding the adv-term grads that leaked into D.

    ``model``: legacy_heads.RefineGAN.  The generator forward reuses the
    composite's eval path (its submodels are norm-free), and the three
    discriminator passes are applied here on the ``discriminator``
    subtree so the freeze is explicit.
    """
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
    )
    from deep_video_interpolation_extrapolation_tpu.losses.bundles import (
        rgb_loss_bundle,
    )
    from deep_video_interpolation_extrapolation_tpu.models.legacy_disc import (
        MultiscaleDiscriminator,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        apply_model as _sub_apply,
    )
    from deep_video_interpolation_extrapolation_tpu.models import registry

    disc = MultiscaleDiscriminator(
        num_d=2, use_sigmoid=True, get_interm_feat=False,
        dtype=registry.compute_dtype(cfg))
    tx_g = state_lib.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate)
    tx_d = optax.sgd(cfg.coarse_learning_rate, momentum=0.9)

    def train_step(params, opt_states, batch_stats, batch, rng,
                   global_step=None):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, frozen)
        adv_on = (jnp.asarray(global_step) > adv_warmup_steps).astype(
            jnp.float32) if global_step is not None else jnp.asarray(1.0)

        def loss_fn(p):
            sg = jax.lax.stop_gradient
            # generator forward: train-mode no-D path (with_disc=False) so
            # BN-bearing submodels (UNet/SepUNet coarse) update their
            # running stats like the reference's train() forward
            g_vars = {"params": p}
            g_mutable = False
            if batch_stats:
                g_vars["batch_stats"] = batch_stats
                g_mutable = ["batch_stats"]
            g_out = model.apply(g_vars, x, seg, gt_x, gt_seg, train=True,
                                with_disc=False, mutable=g_mutable)
            (coarse_rgb, refine_rgbs, out_seg), g_new = (
                g_out if g_mutable else (g_out, {}))
            g_bs = g_new.get("batch_stats", batch_stats or {})
            if not isinstance(refine_rgbs, (list, tuple)):
                refine_rgbs = [refine_rgbs]   # single-scale refiners
            last = refine_rgbs[-1]

            ld = OrderedDict()
            if cfg.train_coarse:
                ld.update(rgb_bundle(cfg, coarse_rgb, gt_x, vgg_fn, "coarse"))
                if cfg.mode == "xs2xs":
                    ld["coarse_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                        out_seg, seg_id_targets(batch["seg2"]))
            for i in range(cfg.n_scales):
                gt_i = gt_x if i == 0 else interpolate_bilinear(
                    gt_x, scale_factor=0.5 ** i, align_corners=True)
                ld.update(rgb_loss_bundle(
                    refine_rgbs[-i - 1], gt_i, cfg.refine_l1_weight,
                    cfg.refine_gdl_weight, cfg.refine_vgg_weight,
                    cfg.refine_ssim_weight, vgg_fn, f"refine_{i}"))

            d_params = p["discriminator"]
            bs_d = (g_bs or {}).get("discriminator", {})
            d_fake, bs_new = _sub_apply(
                disc, d_params, bs_d,
                jnp.concatenate([sg(last), gt_seg], axis=-1))
            d_real, bs_new = _sub_apply(
                disc, d_params, bs_new,
                jnp.concatenate([gt_x, gt_seg], axis=-1))
            g_fake, bs_new = _sub_apply(
                disc, jax.tree_util.tree_map(sg, d_params), bs_new,
                jnp.concatenate([last, gt_seg], axis=-1))
            ld["adv_loss"] = adv_on * cfg.frame_disc_gen_weight * \
                bce_gan_loss(g_fake, True)
            ld["d_real_loss"] = adv_on * cfg.frame_disc_disc_weight * \
                bce_gan_loss(d_real, True)
            ld["d_fake_loss"] = adv_on * cfg.frame_disc_disc_weight * \
                bce_gan_loss(d_fake, False)
            total = sum_losses(ld)
            ld["loss_all"] = total
            new_bs = dict(g_bs or {})   # generator norm updates too
            if bs_new:
                new_bs["discriminator"] = bs_new
            return total, (ld, new_bs)

        (_, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params = dict(params)
        new_opts = dict(opt_states)
        for key, tx in (("coarse_model", tx_g), ("refine_model", tx_g),
                        ("discriminator", tx_d)):
            new_params[key], new_opts[key] = _single_tx_update(
                params[key], grads[key], opt_states[key], tx)
        return new_params, new_opts, new_bs, ld

    return train_step


def init_refiner_gan_opt_states(cfg: Config, params) -> Dict:
    tx_g = state_lib.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate)
    return {
        "coarse_model": tx_g.init(params["coarse_model"]),
        "refine_model": tx_g.init(params["refine_model"]),
        # reference optD: SGD momentum 0.9 at the GLOBAL --lr
        # (refiner_gan.py:74)
        "discriminator": optax.sgd(
            cfg.coarse_learning_rate, momentum=0.9
        ).init(params["discriminator"]),
    }


def make_simple_train_step(cfg: Config, model, frozen=None) -> Callable:
    """Plain single-generator step (legacy Trainer, trainer.py:254-320).
    ``frozen`` supplies VGG params for the bundle's perceptual term
    (RGBLoss always includes it, losses.py:223-241)."""
    tx = state_lib.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate)

    def train_step(params, opt_state, batch_stats, batch, rng):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        vgg_fn = vgg_loss_from_frozen(cfg, frozen)

        def loss_fn(p):
            variables = {"params": p}
            mutable = False
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, x, seg, train=True, mutable=mutable)
            (rgb, seg_logits), new_vars = (out if mutable else (out, {}))
            ld = OrderedDict()
            ld.update(rgb_bundle(cfg, rgb, gt_x, vgg_fn, "gen"))
            if seg_logits is not None and cfg.mode == "xs2xs":
                ld["gen_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                    seg_logits, seg_id_targets(batch["seg2"]))
            total = sum_losses(ld)
            ld["loss_all"] = total
            return total, (ld, new_vars.get("batch_stats", batch_stats))

        (_, (ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt = _single_tx_update(params, grads, opt_state, tx)
        return new_params, new_opt, new_bs, ld

    return train_step
