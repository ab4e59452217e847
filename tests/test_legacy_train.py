"""Legacy runner train-step tests (GANer/VAEer/Trainer equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models.legacy_gen import MyFRRN
from deep_video_interpolation_extrapolation_tpu.models.legacy_heads import GAN
from deep_video_interpolation_extrapolation_tpu.models.vae_video import VideoVAE
from deep_video_interpolation_extrapolation_tpu.train import legacy as L

H, W, B = 16, 32, 1
KEY = jax.random.PRNGKey(0)


def _cfg(**kw):
    base = dict(runner="INTER", model="InterNet", syn_type="inter",
                mode="xs2xs", compute_dtype="float32",
                input_h=H, input_w=W, batch_size=B)
    base.update(kw)
    return Config(**base)


def _inter_batch(seed=0):
    rng = np.random.RandomState(seed)
    b = {}
    for i in range(3):
        b[f"frame{i + 1}"] = jnp.asarray(
            rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
        b[f"seg{i + 1}"] = jnp.asarray(
            np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, H, W))])
    return b


def test_legacy_gan_step():
    cfg = _cfg()
    model = GAN(net_d="multi_scale_img_seg", num_d=2, dtype=jnp.float32)
    batch = _inter_batch()
    # init_gan_variables applies the reference's construction-time DCGAN
    # weights_init to netG/netD (nets/GAN.py:32-33)
    variables = L.init_gan_variables(cfg, model, KEY, batch)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opts = L.init_gan_opt_states(cfg, params)
    step = jax.jit(L.make_gan_train_step(cfg, model))
    new_params, new_opts, new_bs, losses = step(
        params, opts, bs, batch, jax.random.PRNGKey(1))
    # reference GANer loss keys (ganer.py:301-311)
    for k in ("gen_l1_loss", "gen_ce_loss", "adv_loss", "d_real_loss",
              "d_fake_loss"):
        assert np.isfinite(float(losses[k])), k
    # both nets moved
    for net in ("netG", "netD"):
        a = jax.tree_util.tree_leaves(params[net])
        b = jax.tree_util.tree_leaves(new_params[net])
        assert any(not np.array_equal(np.asarray(x_), np.asarray(y_))
                   for x_, y_ in zip(a, b)), net


def test_legacy_gan_adv_term_never_reaches_netD(monkeypatch):
    """The G adversarial pass runs against a stop_gradient'ed netD
    subtree (the reference's set_net_grad(netD, False) around
    pred_fake_G, nets/GAN.py:101-104): scaling the adv term must leave
    the netD update bit-identical while netG's changes."""
    cfg = _cfg()
    model = GAN(net_d="multi_scale_img_seg", num_d=2, dtype=jnp.float32)
    batch = _inter_batch()
    variables = L.init_gan_variables(cfg, model, KEY, batch)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opts = L.init_gan_opt_states(cfg, params)

    def run():
        step = jax.jit(L.make_gan_train_step(cfg, model))
        return step(params, opts, bs, batch, jax.random.PRNGKey(1))[0]

    p1 = run()
    monkeypatch.setattr(L, "_GANER_ADV_WEIGHT", 1000.0)
    p2 = run()
    for x_, y_ in zip(jax.tree_util.tree_leaves(p1["netD"]),
                      jax.tree_util.tree_leaves(p2["netD"])):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))
    assert any(not np.array_equal(np.asarray(x_), np.asarray(y_))
               for x_, y_ in zip(jax.tree_util.tree_leaves(p1["netG"]),
                                 jax.tree_util.tree_leaves(p2["netG"])))


def test_legacy_vae_step():
    t, h, w = 1, 32, 32
    cfg = _cfg(vid_length=t)
    model = VideoVAE(vid_length=t, variant="vae", refine=False,
                     dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(0, 1, (B, t + 1, h, w, 3)), jnp.float32),
        "segs": jnp.asarray(
            np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, t + 1, h, w))]),
        "fg_masks": jnp.asarray(rng.randint(0, 2, (B, t + 1, h, w, 1)), jnp.float32),
    }
    batch["bg_masks"] = 1 - batch["fg_masks"]
    variables = model.init(
        {"params": KEY, "noise": jax.random.PRNGKey(1)},
        batch["frames"], batch["segs"], batch["bg_masks"], batch["fg_masks"],
        train=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx_state = None
    import optax
    from deep_video_interpolation_extrapolation_tpu.train import state as st
    tx_state = st.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate).init(params)
    step = jax.jit(L.make_vae_train_step(cfg, model))
    new_params, new_opt, new_bs, losses = step(
        params, tx_state, bs, batch, jax.random.PRNGKey(2))
    for k in ("recon_warp_loss", "kld_loss", "flow_consist_loss", "loss_all"):
        assert np.isfinite(float(losses[k])), k


def test_legacy_simple_step():
    cfg = _cfg()
    model = MyFRRN(mode="xs2xs", dtype=jnp.float32)
    batch = _inter_batch()
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = model.init(KEY, x, seg, train=True)
    params = variables["params"]
    from deep_video_interpolation_extrapolation_tpu.train import state as st
    opt = st.make_tx(cfg.coarse_optimizer, cfg.coarse_learning_rate).init(params)
    step = jax.jit(L.make_simple_train_step(cfg, model))
    p1, o1, _, losses1 = step(params, opt, {}, batch, jax.random.PRNGKey(0))
    for _ in range(5):
        p1, o1, _, losses = step(p1, o1, {}, batch, jax.random.PRNGKey(0))
    assert float(losses["loss_all"]) < float(losses1["loss_all"])


def test_legacy_refiner_step():
    from deep_video_interpolation_extrapolation_tpu.models.legacy_heads import (
        RefineNet,
    )
    cfg = _cfg(train_coarse=True, train_refine=True, n_scales=1,
               coarse_model="HRNet", refine_model="refineUnet")
    model = RefineNet(cfg=cfg, dtype=jnp.float32)
    batch = _inter_batch()
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = model.init(KEY, x, seg, batch["frame2"], batch["seg2"],
                           train=True)
    params = variables["params"]
    opts = L.init_refiner_opt_states(cfg, params)
    step = jax.jit(L.make_refiner_train_step(cfg, model))
    new_params, new_opts, new_bs, losses = step(
        params, opts, variables.get("batch_stats", {}), batch,
        jax.random.PRNGKey(1))
    for k in ("coarse_l1_loss", "coarse_ce_loss", "refine_0_l1_loss",
              "loss_all"):
        assert np.isfinite(float(losses[k])), k
    for net in ("coarse_model", "refine_model"):
        a = jax.tree_util.tree_leaves(params[net])
        b = jax.tree_util.tree_leaves(new_params[net])
        assert any(not np.array_equal(np.asarray(x_), np.asarray(y_))
                   for x_, y_ in zip(a, b)), net


def test_legacy_refiner_gan_step_freezes_d_for_adv():
    from deep_video_interpolation_extrapolation_tpu.models.legacy_heads import (
        RefineGAN,
    )
    cfg = _cfg(train_coarse=False, n_scales=1, coarse_model="HRNet",
               refine_model="refineUnet")
    model = RefineGAN(cfg=cfg, dtype=jnp.float32)
    batch = _inter_batch()
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = model.init(KEY, x, seg, batch["frame2"], batch["seg2"],
                           train=True)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opts = L.init_refiner_gan_opt_states(cfg, params)
    step = jax.jit(L.make_refiner_gan_train_step(cfg, model))
    new_params, new_opts, new_bs, losses = step(
        params, opts, bs, batch, jax.random.PRNGKey(1))
    for k in ("refine_0_l1_loss", "adv_loss", "d_real_loss", "d_fake_loss"):
        assert np.isfinite(float(losses[k])), k
    # refine and discriminator move; coarse stays put (train_coarse=False
    # and the composite detaches coarse from the refine path)
    for net in ("refine_model", "discriminator"):
        a = jax.tree_util.tree_leaves(params[net])
        b = jax.tree_util.tree_leaves(new_params[net])
        assert any(not np.array_equal(np.asarray(x_), np.asarray(y_))
                   for x_, y_ in zip(a, b)), net
    assert all(np.array_equal(np.asarray(x_), np.asarray(y_))
               for x_, y_ in zip(
                   jax.tree_util.tree_leaves(params["coarse_model"]),
                   jax.tree_util.tree_leaves(new_params["coarse_model"])))


def test_gan_weights_init_stats():
    """gan_weights_init matches utils/net_utils.py:31-37: conv kernels
    ~N(0, 0.02), BatchNorm scale ~N(1, 0.02) / bias 0, dense untouched."""
    from deep_video_interpolation_extrapolation_tpu.train.state import (
        gan_weights_init,
    )
    model = GAN(net_d="multi_scale_img_seg", num_d=2, dtype=jnp.float32)
    batch = _inter_batch()
    x = jnp.concatenate([batch["frame1"], batch["frame3"]], -1)
    seg = jnp.concatenate([batch["seg1"], batch["seg3"]], -1)
    variables = model.init(KEY, x, seg, batch["frame2"], batch["seg2"],
                           train=True)
    params = gan_weights_init(jax.random.PRNGKey(3), variables["params"])

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n_conv = n_bn = 0
    for path, leaf in flat:
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        leaf_name = names[-1]
        arr = np.asarray(leaf)
        if leaf_name == "kernel" and arr.ndim == 4:
            n_conv += 1
            if arr.size >= 1000:
                assert abs(arr.mean()) < 5e-3, names
                assert abs(arr.std() - 0.02) < 5e-3, names
        elif any("BatchNorm" in n for n in names[:-1]):
            n_bn += 1
            if leaf_name == "scale":
                assert abs(arr.mean() - 1.0) < 2e-2, names
            elif leaf_name == "bias":
                assert np.all(arr == 0), names
    assert n_conv > 10 and n_bn > 0
