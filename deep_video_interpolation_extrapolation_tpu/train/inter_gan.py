"""InterGAN trainer step (reference runners/InterGANTrainer.py).

The reference trains the generator and every discriminator from ONE
backward pass, separating gradient flows with fake-``detach`` +
``requires_grad`` toggling (nets/InterGANNet.py:44-107,
InterGANTrainer.py:438-456).  The JAX-exact equivalent inside a single
``jax.grad``:

- D losses see ``stop_gradient(fake)`` -> only D params get D-loss grads;
- G hinge losses apply each discriminator with its *param tree
  stop-gradiented* -> only G params get G-loss grads;
- one ``value_and_grad`` over the combined sum, then per-submodel
  optimizer steps (Adamax for G / Adam for Ds, gated by train_* flags).

Loss-dict keys match InterGANTrainer.py:395-436 exactly.  Note the GAN
trainer computes the coarse RGB bundle on [0,1]-normalized images
(InterGANTrainer.py:395), unlike the plain inter trainer.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.losses.gan import gan_scalar_loss
from deep_video_interpolation_extrapolation_tpu.losses.image import cross_entropy_loss
from deep_video_interpolation_extrapolation_tpu.losses.perceptual import (
    make_track_obj_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.vae import kld_loss
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.models.features import (
    ResNet101Features,
)
from deep_video_interpolation_extrapolation_tpu.train import state as state_lib
from deep_video_interpolation_extrapolation_tpu.train.common import (
    apply_model,
    get_inter_inputs,
    normalize01,
    rgb_bundle,
    sum_losses,
    vgg_loss_from_frozen,
)

# one shared mutable-batch_stats apply (train/common.apply_model); the
# alias keeps this module's call sites and legacy.py's import short
_sub_apply = apply_model

FAMILIES = (
    # (flag attr, params key, model attr, loss key stem, is_video, d_w attr, g_w attr)
    ("frame_disc", "frame_disc_model", "frame_disc_model", "frame", False,
     "frame_disc_disc_weight", "frame_disc_gen_weight"),
    ("frame_det_disc", "frame_det_disc_model", "frame_det_disc_model", "frame_det", False,
     "frame_det_disc_disc_weight", "frame_det_disc_gen_weight"),
    ("video_disc", "video_disc_model", "video_disc_model", "video", True,
     "video_disc_disc_weight", "video_disc_gen_weight"),
    ("video_det_disc", "video_det_disc_model", "video_det_disc_model", "video_det", True,
     "video_det_disc_disc_weight", "video_det_disc_gen_weight"),
)


def init_variables(cfg: Config, rng, batch) -> Dict:
    """Init the GAN composite's per-submodel variables.

    Returns {"params": {...}, "batch_stats": {...}} keyed by submodel name
    ('coarse_model', 'track_gen_model', '<family>_model'), the tree layout
    ``make_train_step`` consumes (mirrors the reference's per-submodel
    modules inside InterGANNet, nets/InterGANNet.py:10-26).

    Deliberately does NOT apply the DCGAN N(0, 0.02) ``gan_weights_init``:
    the reference only calls ``weights_init`` in the legacy GAN head
    (nets/GAN.py:32-33) — InterGANNet and its discriminators use torch's
    default per-module init, which Flax defaults approximate here.  The
    DCGAN init is applied exactly where the reference applies it, in the
    legacy GAN trainer (train/legacy.py).
    """
    x, seg, gt_x, gt_seg = get_inter_inputs(batch)
    bboxes = batch.get("bboxes")
    keys = jax.random.split(rng, 8)
    params: Dict = {}
    batch_stats: Dict = {}

    def add(name, variables):
        params[name] = variables["params"]
        if "batch_stats" in variables:
            batch_stats[name] = variables["batch_stats"]

    coarse = registry.build_coarse(cfg)
    add("coarse_model", coarse.init(
        {"params": keys[0], "noise": keys[1]}, x, seg, gt_x, gt_seg, train=True))
    if cfg.track_gen:
        track_gen = registry.build_track_gen(cfg)
        coarse_rgb = jnp.zeros_like(gt_x)
        coarse_seg = jnp.zeros_like(gt_seg)
        kw = {"gt_bbox_for_loss": True} if "V2" in cfg.track_gen_model else {}
        add("track_gen_model", track_gen.init(
            keys[2], x, seg, coarse_rgb, coarse_seg, bboxes, train=True, **kw))
    for i, (flag, pkey, _attr, _stem, is_video, _dw, _gw) in enumerate(FAMILIES):
        if getattr(cfg, flag):
            disc = registry.build_disc(cfg, getattr(cfg, _attr))
            extra = (x, seg) if is_video else ()
            add(pkey, disc.init(keys[3 + i], gt_x, gt_seg, *extra,
                                bboxes=bboxes, train=True))
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def make_train_step(cfg: Config, track_obj_frozen=None) -> Callable:
    import inspect

    coarse = registry.build_coarse(cfg)
    track_gen = registry.build_track_gen(cfg) if cfg.track_gen else None
    discs = {}
    for flag, pkey, _attr, stem, is_video, dw, gw in FAMILIES:
        if getattr(cfg, flag):
            disc = registry.build_disc(cfg, getattr(cfg, _attr))
            if stem == "video_det" and not getattr(
                    disc, "supports_sync_neg", False):
                # the sync_neg track-mismatch negative DEFINES this
                # family; the reference passes sync_neg=True/gt_x
                # unconditionally and TypeErrors on a plain video disc in
                # this slot (InterGANNet.py:68-70) — fail loudly rather
                # than silently training without the defining negative
                raise ValueError(
                    f"--video_det_disc_model {getattr(cfg, _attr)!r} has "
                    "no sync_neg support; pick a Video*DetDiscriminator")
            # only some det discs consume the GT frame (gt_x) — e.g.
            # VideoGlobalMaskSNDetDiscriminator's box-swap base; the
            # reference passes gt_x to every video_det call
            wants_gt = ("gt_x"
                        in inspect.signature(type(disc).__call__).parameters)
            discs[pkey] = (disc, stem, is_video,
                           getattr(cfg, dw), getattr(cfg, gw), wants_gt)

    track_module = (ResNet101Features(dtype=registry.compute_dtype(cfg))
                    if cfg.track_obj_loss else None)

    def train_step(state: state_lib.TrainState, batch, rng):
        x, seg, gt_x, gt_seg = get_inter_inputs(batch)
        bboxes = batch.get("bboxes")
        vgg_fn = vgg_loss_from_frozen(cfg, state.frozen)
        # frozen ResNet101 for TrackObjLoss rides in state.frozen like the
        # VGG params (the explicit argument wins for tests/tools); without
        # it --track_obj_loss used to be a silent no-op
        track_obj = None
        rn_vars = (track_obj_frozen if track_obj_frozen is not None
                   else (state.frozen or {}).get("resnet101"))
        if track_module is not None and rn_vars is not None:
            track_obj = make_track_obj_loss(track_module, rn_vars)
        if cfg.track_obj_loss and (track_obj is None or bboxes is None):
            # fail at trace time, not silently: the reference asserts the
            # boxes exist (losses.py TrackObjLoss) — a configured
            # objective must never quietly drop out of the loss dict
            missing = ("ResNet101 features in state.frozen['resnet101'] "
                       "(or track_obj_frozen)" if track_obj is None
                       else "bbox tracks in the batch")
            raise ValueError(f"--track_obj_loss requires {missing}")
        noise_key, sync_key = jax.random.split(rng)

        def loss_fn(params):
            ld = OrderedDict()
            bs_all = dict(state.batch_stats) if state.batch_stats else {}

            def bs_of(key):
                return bs_all.get(key, {})

            (coarse_rgb, coarse_seg_logits, mu, logvar), new_bs = _sub_apply(
                coarse, params["coarse_model"], bs_of("coarse_model"),
                x, seg, gt_x, gt_seg, rngs={"noise": noise_key}, train=True)
            if new_bs:
                bs_all["coarse_model"] = new_bs
            if cfg.track_gen:
                kw = {"gt_bbox_for_loss": True} if "V2" in cfg.track_gen_model else {}
                (coarse_rgb, coarse_seg_logits, gen_bbox, loc_diff), tg_bs = _sub_apply(
                    track_gen, params["track_gen_model"], bs_of("track_gen_model"),
                    x, seg, coarse_rgb, coarse_seg_logits, bboxes, train=True, **kw)
                if tg_bs:
                    bs_all["track_gen_model"] = tg_bs
            else:
                loc_diff = jnp.zeros(())

            soft = jax.nn.softmax(coarse_seg_logits, axis=-1)
            sg = jax.lax.stop_gradient

            # generator reconstruction losses (InterGANTrainer.py:393-418)
            ld.update(rgb_bundle(cfg, normalize01(coarse_rgb), normalize01(gt_x),
                                 vgg_fn, "coarse"))
            if track_obj is not None and bboxes is not None:
                ld["coarse_track_obj_loss"] = cfg.track_obj_weight * track_obj(
                    normalize01(coarse_rgb), normalize01(x[..., :3]),
                    normalize01(x[..., 3:6]), bboxes)
            if cfg.mode == "xs2xs":
                ld["coarse_ce_loss"] = cfg.ce_weight * cross_entropy_loss(
                    coarse_seg_logits, jnp.argmax(gt_seg, axis=-1))
            if cfg.track_gen:
                ld["coarse_loc_diff_loss"] = cfg.loc_diff_weight * jnp.mean(loc_diff)
            if cfg.vae:
                ld["coarse_kld_loss"] = kld_loss(mu, logvar, cfg.kld_weight)

            # discriminator families (InterGANTrainer.py:412-436).  Pass
            # order and batch_stats chaining match the reference's four
            # train-mode forwards: fake(detached) -> sync_neg -> real ->
            # G-pass (InterGANNet.py:66-103) — the sync pass's BN/SN
            # power-iteration updates COUNT there too.
            for pkey, (disc, stem, is_video, d_w, g_w, wants_gt) in (
                    discs.items()):
                extra = (x, seg) if is_video else ()
                gt_kw = {"gt_x": gt_x} if wants_gt else {}

                def family(d_params, d_bs, coarse_rgb, soft, gt_x, gt_seg,
                           extra, disc=disc, stem=stem, gt_kw=gt_kw):
                    frozen_d = jax.tree_util.tree_map(sg, d_params)
                    d_fake, d_bs = _sub_apply(
                        disc, d_params, d_bs, sg(coarse_rgb), sg(soft),
                        *extra, bboxes=bboxes, train=True, **gt_kw)
                    if stem == "video_det":
                        # the 'sync_neg' rng randomizes the track-mismatch
                        # offset (detdisc._sync_neg_boxes); without it the
                        # negative was the same rotate-by-one every step
                        d_sync, d_bs = _sub_apply(
                            disc, d_params, d_bs, gt_x, gt_seg, *extra,
                            bboxes=bboxes, sync_neg=True, train=True,
                            rngs={"sync_neg": sync_key}, **gt_kw)
                        d_fake = (d_fake + d_sync) / 2
                    d_real, d_bs = _sub_apply(
                        disc, d_params, d_bs, gt_x, gt_seg, *extra,
                        bboxes=bboxes, train=True, **gt_kw)
                    g_fake, d_bs = _sub_apply(
                        disc, frozen_d, d_bs, coarse_rgb, soft, *extra,
                        bboxes=bboxes, train=True, **gt_kw)
                    return d_fake, d_real, g_fake, d_bs

                if cfg.remat:
                    # --remat: each family's 3-4 full-res forwards are one
                    # checkpoint region — its outputs are loss logits plus
                    # the (tiny) SN/BN stats, so the only residuals across
                    # the combined backward are the region's inputs; the
                    # disc conv activations rematerialize in backprop
                    # (same knob as the generator's stage remat,
                    # models/hrnet.py)
                    family = jax.checkpoint(family, prevent_cse=False)
                d_fake, d_real, g_fake, d_bs = family(
                    params[pkey], bs_of(pkey), coarse_rgb, soft, gt_x,
                    gt_seg, extra)
                if d_bs:
                    bs_all[pkey] = d_bs
                ld[f"coarse_{stem}_loss"] = gan_scalar_loss(g_fake, True, g_w)
                ld[f"disc_{stem}_real_loss"] = gan_scalar_loss(d_real, True, d_w)
                ld[f"disc_{stem}_fake_loss"] = gan_scalar_loss(d_fake, False, d_w)

            total = sum_losses(ld)
            ld["loss_all"] = total
            return total, (ld, bs_all)

        (_, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state_lib.apply_updates(cfg, state, grads, new_bs)
        return new_state, loss_dict

    return train_step
