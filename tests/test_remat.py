"""Stage-granular rematerialization (--remat) correctness.

``_HRBackbone.remat=True`` checkpoints the backbone per segment
(stem+layer1, each transition, each stage module) via ``nn.remat``
(models/hrnet.py).  These tests pin that the lifted transform:

- leaves the parameter tree bit-identical (checkpoint/torch-port
  compatibility — param paths must not move under the lift),
- computes the exact same forward,
- computes the same gradients (remat changes scheduling, not math), and
- composes with the runner contract: ``remat_internal`` drops the outer
  whole-forward ``jax.checkpoint`` for plain InterNet/ExtraNet and keeps
  it elsewhere, with identical losses either way.

Reference semantics being preserved: the reference has no remat (torch
keeps all activations, runners/InterTrainer.py backward); --remat is this
framework's TPU-HBM enabler for full-res training and must be a pure
memory/scheduling knob.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.data.synthetic import synthetic_batch
from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet, VAEHRNet
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.train import (
    inter as inter_lib,
    state as state_lib,
)

H, W, B = 16, 32, 1


def _tree_paths(tree):
    return jax.tree_util.tree_structure(tree)


def _inputs(key):
    k1, k2 = jax.random.split(key)
    rgb = jax.random.normal(k1, (B, H, W, 6), dtype=jnp.float32)
    seg = jax.nn.one_hot(
        jax.random.randint(k2, (B, H, W), 0, 20), 20, dtype=jnp.float32)
    seg = jnp.concatenate([seg, seg], axis=-1)
    return rgb, seg


def test_hrnet_remat_forward_and_grads_match():
    rgb, seg = _inputs(jax.random.PRNGKey(0))
    base = HRNet(dtype=jnp.float32, remat=False)
    rem = HRNet(dtype=jnp.float32, remat=True)
    v0 = base.init(jax.random.PRNGKey(1), rgb, seg, train=True)
    v1 = rem.init(jax.random.PRNGKey(1), rgb, seg, train=True)
    # the lifted transform must not move parameter paths
    assert _tree_paths(v0) == _tree_paths(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, variables):
        r, s = model.apply(variables, rgb, seg, train=True)
        return (jnp.sum(r ** 2) + jnp.sum(s ** 2)) / r.size

    l0, g0 = jax.value_and_grad(lambda v: loss(base, v))(v0)
    l1, g1 = jax.value_and_grad(lambda v: loss(rem, v))(v0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_vaehrnet_remat_forward_matches():
    rgb, seg = _inputs(jax.random.PRNGKey(2))
    gt_rgb, gt_seg = rgb[..., :3], seg[..., :20]
    base = VAEHRNet(dtype=jnp.float32, remat=False)
    rem = VAEHRNet(dtype=jnp.float32, remat=True)
    v = base.init({"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
                  rgb, seg, gt_rgb, gt_seg, train=True)
    assert _tree_paths(v) == _tree_paths(
        rem.init({"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
                 rgb, seg, gt_rgb, gt_seg, train=True))
    out0 = base.apply(v, rgb, seg, gt_rgb, gt_seg, train=True,
                      rngs={"noise": jax.random.PRNGKey(5)}, mutable=["batch_stats"])
    out1 = rem.apply(v, rgb, seg, gt_rgb, gt_seg, train=True,
                     rngs={"noise": jax.random.PRNGKey(5)}, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(out0), jax.tree_util.tree_leaves(out1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_remat_internal_contract():
    def mk(**kw):
        base = dict(
            runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
            train_coarse=True, coarse_model="HRNet", compute_dtype="float32",
            input_h=H, input_w=W, batch_size=B, dataset="synthetic")
        base.update(kw)
        return Config(**base)
    assert registry.remat_internal(mk(remat=True))
    assert not registry.remat_internal(mk(remat=False))
    assert not registry.remat_internal(mk(remat=True, model="InterRefineNet"))
    assert not registry.remat_internal(mk(remat=True, coarse_model="UNet"))


def test_inter_train_step_remat_loss_matches():
    cfg0 = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="float32",
        input_h=H, input_w=W, batch_size=B, dataset="synthetic", remat=False)
    cfg1 = cfg0.replace(remat=True) if hasattr(cfg0, "replace") else None
    if cfg1 is None:
        import dataclasses
        cfg1 = dataclasses.replace(cfg0, remat=True)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(B, H, W, vid_len=3, seed=0).items()}
    losses = {}
    for tag, cfg in (("base", cfg0), ("remat", cfg1)):
        model = registry.build_model(cfg)
        x = jnp.concatenate([batch["frame1"], batch["frame3"]], axis=-1)
        seg_parts = []
        for k in ("seg1", "seg3"):
            s = batch[k]
            seg_parts.append(jax.nn.one_hot(s.astype(jnp.int32), 20)
                             if s.ndim == 3 else s)
        seg = jnp.concatenate(seg_parts, axis=-1)
        variables = model.init(jax.random.PRNGKey(0), x, seg, train=True)
        state = state_lib.create_train_state(cfg, variables, frozen={})
        step = inter_lib.make_train_step(cfg, model)
        _, logs = step(state, batch, jax.random.PRNGKey(1))
        losses[tag] = float(logs["loss"] if "loss" in logs
                            else sum(v for k, v in logs.items()
                                     if k.endswith("_loss")))
    np.testing.assert_allclose(losses["base"], losses["remat"],
                               rtol=1e-5, atol=1e-6)


def test_gan_train_step_remat_loss_matches():
    """The per-family discriminator checkpoint region (train/inter_gan.py)
    must be a pure scheduling knob: identical losses and parameter updates
    with and without --remat."""
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter_gan as gan_lib,
    )

    def mk(remat):
        return Config(
            runner="INTER", model="InterGANNet", syn_type="inter",
            mode="xs2xs", train_coarse=True, coarse_model="VAEHRNet",
            compute_dtype="float32", input_h=H, input_w=W, batch_size=B,
            dataset="synthetic", vae=True, gan=True,
            frame_disc=True, train_frame_disc=True, remat=remat)

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(B, H, W, vid_len=3, seed=0).items()}
    results = {}
    for remat in (False, True):
        cfg = mk(remat)
        variables = gan_lib.init_variables(cfg, jax.random.PRNGKey(0), batch)
        state = state_lib.create_train_state(cfg, variables, frozen={})
        step = gan_lib.make_train_step(cfg)
        new_state, losses = step(state, batch, jax.random.PRNGKey(1))
        results[remat] = (losses, new_state)
    l0, s0 = results[False]
    l1, s1 = results[True]
    for k in l0:
        np.testing.assert_allclose(float(l0[k]), float(l1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_vaehrnet_conv_latent_above_cap():
    """Above the 4096-element latent cap the VAE moment heads go spatial
    (1x1 convs) instead of the reference's flat Dense — whose parameter
    count scales with the SQUARE of the pixel count (models/hrnet.py
    VAEHRNet.__call__; at 512x1024 the Dense pair would be ~2 GiB bf16
    each + 8 GiB Adamax state apiece).  Reference semantics at its own
    resolutions (latent <= 4096) are pinned by test_vaehrnet_parity."""
    h, w = 256, 384   # latent = 16*(256/16)*(384/16) = 6144 > 4096
    rgb = jnp.zeros((1, h, w, 6), jnp.float32)
    seg = jnp.zeros((1, h, w, 40), jnp.float32)
    m = VAEHRNet(dtype=jnp.float32)
    v = jax.eval_shape(
        lambda: m.init({"params": jax.random.PRNGKey(0),
                        "noise": jax.random.PRNGKey(1)},
                       rgb, seg, rgb[..., :3], seg[..., :20], train=True))
    params = v["params"]
    assert "mu_conv" in params and "logvar_conv" in params
    assert "mu_fc" not in params and "logvar_fc" not in params
    # 1x1 conv heads: 16 -> 16 per position (vs 6144x6144 Dense)
    assert params["mu_conv"]["kernel"].shape == (1, 1, 16, 16)
    # eval mode samples a spatial z of the decoder's expected shape
    out = jax.eval_shape(
        lambda p: m.apply(p, rgb, seg, train=False,
                          rngs={"noise": jax.random.PRNGKey(2)}),
        v)
    rgb_out, seg_out = out[0], out[1]
    assert rgb_out.shape == (1, h, w, 3) and seg_out.shape == (1, h, w, 20)
