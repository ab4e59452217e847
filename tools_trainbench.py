"""Training-throughput bench: InterNet at the reference's blessed recipe.

Measures the full train step (forward + VGG-perceptual loss + backward +
per-submodel Adamax) for InterNet/HRNet at the reference author's actual
training configuration — 128x128 crops (docs/RECIPES.md §1; reference
cmd:160-162 trained bs 16-48 on 2-6x 11GB GPUs) — on one chip, plus the
full-resolution 1024x512 variant used by bench.py.

Timing rules as bench.py: the whole measured loop lives in ONE jit
(``lax.scan`` over the train step; the relay costs ~30 ms per synchronous
round trip), params change every step so no model compute can hoist.
VGG loss runs with randomly initialized frozen weights — identical FLOPs
to the pretrained ones.

``--gan`` switches to the author's VAE-GAN "suitable params" recipe
(docs/RECIPES.md §4; reference cmd:196-209): VAEHRNet coarse + the four
SN discriminator families, KLD + hinge losses, single-backward G+D.

Usage: python tools_trainbench.py [--bs 24] [--hw 128,128] [--iters 10]
                                  [--gan]
Prints one JSON line {"metric", "value", "unit", "config"}.
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=24)
    ap.add_argument("--hw", type=str, default="128,128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-vgg", action="store_true")
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--extra", type=int, default=0, metavar="N_STEPS",
                    help="bench the EXTRApolation runner instead: ExtraNet/"
                         "HRNet autoregressive rollout over N_STEPS "
                         "prediction windows (BPTT through the rollout, "
                         "runners/ExtraTrainer.py:253-310 semantics)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the backbone (full-res configs "
                         "need it to fit HBM)")
    ap.add_argument("--mem-only", action="store_true",
                    help="compile the train loop and print the compiler's "
                         "HBM memory analysis instead of running it "
                         "(OOM forensics — the relay's runtime "
                         "RESOURCE_EXHAUSTED carries no breakdown)")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    import jax
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.cache import (
        enable_compilation_cache,
    )
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter,
        state as state_lib,
    )
    from deep_video_interpolation_extrapolation_tpu.train.common import (
        init_vgg_frozen,
    )

    enable_compilation_cache()
    b = args.bs
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    if args.gan:
        # the author's VAE-GAN recipe (cmd:196-209): VAEHRNet + four SN
        # discriminator families, single combined backward
        from deep_video_interpolation_extrapolation_tpu.data.synthetic import (
            synthetic_batch,
        )
        from deep_video_interpolation_extrapolation_tpu.train import inter_gan

        cfg = Config(
            runner="INTER", model="InterGANNet", syn_type="inter",
            mode="xs2xs", compute_dtype=args.dtype,
            input_h=h, input_w=w, batch_size=b, dataset="synthetic",
            coarse_model="VAEHRNet", vae=True, gan=True, train_coarse=True,
            frame_disc=True, train_frame_disc=True,
            frame_disc_model="FrameSNDiscriminator",
            video_disc=True, train_video_disc=True,
            video_disc_model="VideoSNDiscriminator",
            frame_det_disc=True, train_frame_det_disc=True,
            frame_det_disc_model="FrameSNDetDiscriminator",
            video_det_disc=True, train_video_det_disc=True,
            video_det_disc_model="VideoLSSNDetDiscriminator",
            num_track_per_img=10, remat=args.remat,
        )
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(
                     b, h, w, n_track=cfg.num_track_per_img, seed=0).items()}
        variables = inter_gan.init_variables(cfg, k0, batch)
        frozen = ({} if args.no_vgg or not cfg.vgg_weight
                  else {"vgg": init_vgg_frozen(cfg, k1)})
        state = state_lib.create_train_state(cfg, variables, frozen=frozen)
        step = inter_gan.make_train_step(cfg)
        metric = "intergannet_vaehrnet_train_step_rate"
    elif args.extra:
        from deep_video_interpolation_extrapolation_tpu.train import extra
        n_steps = args.extra
        cfg = Config(
            runner="EXTRA", model="ExtraNet", syn_type="extra", mode="xs2xs",
            train_coarse=True, coarse_model="HRNet",
            compute_dtype=args.dtype, remat=args.remat,
            num_pred_step=n_steps, num_pred_once=1, vid_length=n_steps,
            input_h=h, input_w=w, batch_size=b, dataset="synthetic",
        )
        model = registry.build_model(cfg)
        dt = registry.compute_dtype(cfg)
        # context frames 1,2 + rollout targets 3..2+n_steps (uint8 seg ids,
        # the loader contract)
        batch = {}
        for i in range(1, 3 + n_steps):
            batch[f"frame{i}"] = jax.random.uniform(
                jax.random.fold_in(k2, i), (b, h, w, 3), jnp.float32, -1, 1)
            batch[f"seg{i}"] = jnp.zeros((b, h, w), jnp.uint8)
        x = jnp.concatenate([batch["frame1"], batch["frame2"]], axis=-1)
        seg = jnp.concatenate(
            [jax.nn.one_hot(batch["seg1"], 20, dtype=dt),
             jax.nn.one_hot(batch["seg2"], 20, dtype=dt)], axis=-1)
        variables = jax.jit(model.init, static_argnames=["train"])(
            {"params": k0, "noise": k0}, x, seg,
            gt_rgb=batch["frame3"],
            gt_seg=jax.nn.one_hot(batch["seg3"], 20, dtype=dt), train=True)
        frozen = ({} if args.no_vgg or not cfg.vgg_weight
                  else {"vgg": init_vgg_frozen(cfg, k1)})
        state = state_lib.create_train_state(cfg, variables, frozen=frozen)
        step = extra.make_train_step(cfg, model)
        metric = "extranet_hrnet_train_step_rate"
    else:
        cfg = Config(
            runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
            train_coarse=True, coarse_model="HRNet",
            compute_dtype=args.dtype, remat=args.remat,
            input_h=h, input_w=w, batch_size=b, dataset="synthetic",
        )
        model = registry.build_model(cfg)
        dt = registry.compute_dtype(cfg)
        rgb = jnp.zeros((b, h, w, 6), dt)
        seg = jnp.zeros((b, h, w, 40), dt)
        variables = jax.jit(model.init, static_argnames=["train"])(
            k0, rgb, seg, train=True)
        frozen = ({} if args.no_vgg or not cfg.vgg_weight
                  else {"vgg": init_vgg_frozen(cfg, k1)})
        state = state_lib.create_train_state(cfg, variables, frozen=frozen)
        # uint8 class ids, the real loader's host->device contract
        # (data/folder.py / train/common.seg_oh) — a 20-ch f32 one-hot
        # batch would hold 80x the seg bytes in HBM for the loop's life
        batch = {
            "frame1": jax.random.uniform(k2, (b, h, w, 3), jnp.float32, -1, 1),
            "frame2": jax.random.uniform(k2, (b, h, w, 3), jnp.float32, -1, 1),
            "frame3": jax.random.uniform(k2, (b, h, w, 3), jnp.float32, -1, 1),
            "seg1": jnp.zeros((b, h, w), jnp.uint8),
            "seg2": jnp.zeros((b, h, w), jnp.uint8),
            "seg3": jnp.zeros((b, h, w), jnp.uint8),
        }
        step = inter.make_train_step(cfg, model)
        metric = "internet_hrnet_train_step_rate"

    # donate the state like the real runner (cfg.donate_state default):
    # without it the loop holds input AND output params/opt-state
    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(state, batch, rng):
        def body(carry, i):
            st, _ = carry
            st2, losses = step(st, batch, jax.random.fold_in(rng, i))
            return (st2, losses["loss_all"]), None
        (st, last), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(args.iters))
        return st, last

    if args.mem_only:
        compiled = loop.lower(state, batch, jax.random.PRNGKey(7)).compile()
        ma = compiled.memory_analysis()
        gib = 1024 ** 3
        print(json.dumps({
            "metric": "train_loop_hbm_gib",
            "config": f"bs{b}_{h}x{w}_{args.dtype}"
                      + ("_gan" if args.gan else "")
                      + (f"_extra{args.extra}" if args.extra else "")
                      + ("_remat" if args.remat else ""),
            "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
            "argument_gib": round(ma.argument_size_in_bytes / gib, 3),
            "output_gib": round(ma.output_size_in_bytes / gib, 3),
            "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
            "total_gib": round((ma.temp_size_in_bytes
                                + ma.argument_size_in_bytes
                                + ma.output_size_in_bytes
                                - ma.alias_size_in_bytes) / gib, 3),
        }))
        return

    # the state is DONATED: rebind it from each call's output (the input
    # buffers are consumed, like the real runner's step-to-step handoff)
    state, last = loop(state, batch, jax.random.PRNGKey(7))
    # fence through the relay AND act as a corruption canary: the r5
    # accumulator episode produced inf in ONE loss key while every perf
    # number looked healthy (docs/TRAINBENCH_r5.md) — a non-finite loss
    # here means the measured graph is computing garbage
    assert math.isfinite(float(last)), (
        f"non-finite loss_all={float(last)} in the measured train loop")

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, last = loop(state, batch, jax.random.PRNGKey(7))
        assert math.isfinite(float(last))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    sps = args.iters / best
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 3),
        "unit": "steps/sec/chip",
        "frames_per_sec": round(sps * b, 2),
        "config": f"bs{b}_{h}x{w}_{args.dtype}_vgg={not args.no_vgg}"
                  + ("_gan" if args.gan else "")
                  + (f"_extra{args.extra}" if args.extra else "")
                  + ("_remat" if args.remat else ""),
    }))


if __name__ == "__main__":
    main()
