"""Serving export: serialize a trained model's forward to StableHLO.

The reference has no deployment story — inference is the training repo
plus a checkpoint (runners/InterTrainer.py:786-856 ``mini_test``).  For
production serving this module freezes a composite head's forward
(params baked in as constants) into a portable `jax.export` artifact:

- one file, self-contained (no Python model code needed at load time);
- versioned StableHLO with jax.export's compatibility guarantees;
- multi-platform: export once, run on any platform listed in
  ``platforms`` (default: the current backend).  Exporting from a CPU
  host for TPU serving works because tracing is abstract.

Note on Pallas fast paths: the kernel routes gate on the backend *at
trace time* (core/hw.pallas_enabled).  Exports taken on a CPU host are
pure XLA (portable everywhere); exports taken on TPU with DVIE_PALLAS=1
embed Mosaic custom calls and should be served on matching TPU
runtimes.  Set DVIE_PALLAS=0 while exporting to force the portable
composition.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _needs_noise_rng(cfg) -> bool:
    """VAE generators sample prior z at eval via the 'noise' rng
    (models/hrnet.py VAEHRNet)."""
    return bool(getattr(cfg, "vae", False)
                or cfg.coarse_model == "VAEHRNet")


def forward_fn(cfg, model, variables) -> Callable:
    """The serving forward: (rgb, seg) -> (rgb_pred, seg_pred).

    Params are closed over (serialized as constants), eval mode, the same
    call ``mini_test``/cycgen run per window (train/runner.py).  VAE/GAN
    generators additionally take a leading int32 ``seed`` scalar: their
    eval path samples prior z from the 'noise' rng, so the exported
    signature is (seed, rgb, seg) and serving controls the draw."""

    if _needs_noise_rng(cfg):
        def fwd(seed, rgb, seg):
            out = model.apply(variables, rgb, seg, train=False,
                              rngs={"noise": jax.random.PRNGKey(seed)})
            return out[0], out[1]
    else:
        def fwd(rgb, seg):
            out = model.apply(variables, rgb, seg, train=False)
            return out[0], out[1]

    return fwd


def export_forward(
    cfg,
    variables,
    path: str,
    model=None,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the model's forward to ``path``; returns ``path``.

    ``batch_size`` defaults to ``cfg.batch_size``; the input signature
    follows the head: 2 input frames (rgb (B,H,W,6), seg (B,H,W,40)) for
    interpolation and plain extrapolation, 3 for ``--fix_init_frames``
    extrapolation — in the compute dtype (--compute_dtype).  GAN heads
    export their generator's eval forward (prior-z VAE path) with a
    leading int32 ``seed`` scalar input for the z draw; the
    discriminators are training-only and are not serialized.  TrackGen
    branches are not exported (they need per-frame boxes; serving uses
    the coarse generator, like the reference's cycgen).
    """
    from jax import export as jex

    from deep_video_interpolation_extrapolation_tpu.models import registry

    if cfg.model in ("VAE", "VAE_S", "VAE_SD"):
        raise ValueError(
            "legacy flow-VAE heads take 5-D video (+ fg/bg mask) inputs "
            "(models/vae_video.py) and do not fit the (rgb, seg) serving "
            "signature; export a composite head instead")
    if model is None:
        model = registry.build_model(cfg)
    b = batch_size or cfg.batch_size
    dt = registry.compute_dtype(cfg)
    n_in = 3 if (cfg.syn_type == "extra" and cfg.fix_init_frames) else 2
    rgb = jax.ShapeDtypeStruct((b, cfg.input_h, cfg.input_w, 3 * n_in), dt)
    seg = jax.ShapeDtypeStruct((b, cfg.input_h, cfg.input_w, 20 * n_in), dt)
    sig = ((rgb, seg) if not _needs_noise_rng(cfg)
           else (jax.ShapeDtypeStruct((), jnp.int32), rgb, seg))
    exported = jex.export(
        jax.jit(forward_fn(cfg, model, variables)),
        platforms=tuple(platforms) if platforms else None,
    )(*sig)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def rollout_fn(cfg, model, variables, steps: int) -> Callable:
    """The full autoregressive cycgen rollout as ONE function: the
    reference's ``mini_test`` sliding window (InterTrainer.py:786-856) —
    each step feeds the predicted rgb back doubled into the 2-frame
    window and the predicted seg via argmax -> one-hot.  ``lax.scan``
    keeps it a single compiled program, exportable as one artifact."""

    def roll(rgb, seg_ids):
        def step(carry, _):
            cur_rgb, cur_ids = carry
            oh = jax.nn.one_hot(cur_ids, 20, dtype=cur_rgb.dtype)
            cur_seg = jnp.concatenate([oh, oh], axis=-1)
            out_rgb, out_seg = model.apply(variables, cur_rgb, cur_seg,
                                           train=False)
            nxt_rgb = jnp.concatenate(
                [out_rgb, out_rgb], axis=-1).astype(cur_rgb.dtype)
            nxt_ids = jnp.argmax(out_seg, -1).astype(jnp.uint8)
            return (nxt_rgb, nxt_ids), (out_rgb, nxt_ids)
        _, (frames, ids) = jax.lax.scan(step, (rgb, seg_ids), None,
                                        length=steps)
        return frames, ids

    return roll


def export_rollout(
    cfg,
    variables,
    path: str,
    steps: int,
    model=None,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize the ``steps``-frame autoregressive rollout to ``path``.

    Signature: (rgb (B,H,W,6), seg_ids (B,H,W) uint8) -> (frames
    (steps,B,H,W,3), ids (steps,B,H,W) uint8).  The whole inference
    product — N generated frames from one 2-frame window — is a single
    self-contained StableHLO artifact; the reference needs its full
    training repo in the loop for the same output."""
    from jax import export as jex

    from deep_video_interpolation_extrapolation_tpu.models import registry

    if model is None:
        model = registry.build_model(cfg)
    if _needs_noise_rng(cfg):
        raise ValueError("rollout export covers the deterministic "
                         "interpolation head; VAE heads need a seed per "
                         "window — export_forward serves those")
    b = batch_size or cfg.batch_size
    dt = registry.compute_dtype(cfg)
    rgb = jax.ShapeDtypeStruct((b, cfg.input_h, cfg.input_w, 6), dt)
    ids = jax.ShapeDtypeStruct((b, cfg.input_h, cfg.input_w), jnp.uint8)
    exported = jex.export(
        jax.jit(rollout_fn(cfg, model, variables, steps)),
        platforms=tuple(platforms) if platforms else None,
    )(rgb, ids)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str) -> Callable:
    """Deserialize an ``export_forward`` artifact into a callable.

    The callable runs under ``jax.jit`` on the current backend; no model
    code or checkpoint is needed."""
    from jax import export as jex

    with open(path, "rb") as f:
        exported = jex.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)
