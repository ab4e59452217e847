"""Numerical parity of our VAEHRNet against the reference torch VAEHRNet
(nets/HRNet.py:702-1061) via tools/torch_port.port_vaehrnet: VAE encoder +
mu/logvar Linears (with the latent flatten permutation), VAE decoder
(ConvT + BatchNorm running stats), and leaf-count completeness.  The HRNet
backbone portion shares port_hrnet, already parity-proven in
tests/test_hrnet_parity.py.  The stochastic reparameterization itself
cannot be aligned across frameworks (different RNGs), so the full forward
is compared at the mu/logvar interface.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/nets/HRNet.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ported():
    import argparse

    import torch

    from test_hrnet_parity import _load_ref_hrnet

    ref = _load_ref_hrnet()
    args = argparse.Namespace(
        syn_type="inter", mode="xs2xs", num_pred_once=1, inpaint=False,
        inpaint_mask=False, highres_large=False, fix_init_frames=False,
        rank=0)
    torch.manual_seed(0)
    tm = ref.VAEHRNet(args)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        VAEHRNet,
    )
    ours = VAEHRNet(syn_type="inter", dtype=jnp.float32)

    rng = np.random.RandomState(0)
    b, h, w = 1, 128, 128
    rgb = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    ids = rng.randint(0, 20, (b, h, w, 3))
    seg = np.concatenate(
        [np.eye(20, dtype=np.float32)[ids[..., i]] for i in range(2)], -1)
    gt_rgb = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    gt_seg = np.eye(20, dtype=np.float32)[ids[..., 2]]

    variables = ours.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(rgb), jnp.asarray(seg), jnp.asarray(gt_rgb),
        jnp.asarray(gt_seg), train=True)

    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_vaehrnet,
    )
    params, batch_stats = port_vaehrnet(
        sd, variables["params"], variables.get("batch_stats", {}))
    return (tm, sd, params, batch_stats, variables,
            (rgb, seg, gt_rgb, gt_seg))


def test_leaf_count_complete(ported):
    """Every torch tensor has a home: our params+batch_stats leaf count ==
    torch state_dict minus the num_batches_tracked counters."""
    _tm, sd, params, batch_stats, variables, _ = ported
    n_ours = (len(jax.tree_util.tree_leaves(params))
              + len(jax.tree_util.tree_leaves(batch_stats)))
    n_torch = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_ours == n_torch, (n_ours, n_torch)


def test_vae_encoder_mu_logvar_parity(ported):
    import torch

    tm, _sd, params, batch_stats, _v, (rgb, seg, gt_rgb, gt_seg) = ported
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        _VAEEncoder,
    )
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        _latent_perm,
    )

    vae_in = np.concatenate([rgb, seg, gt_rgb, gt_seg], -1)
    enc = _VAEEncoder(dtype=jnp.float32)
    e = enc.apply(
        {"params": params["vae_encoder"],
         "batch_stats": batch_stats["vae_encoder"]},
        jnp.asarray(vae_in), train=False)
    e_flat = e.reshape(e.shape[0], -1)
    mu_our = e_flat @ params["mu_fc"]["kernel"] + params["mu_fc"]["bias"]
    lv_our = (e_flat @ params["logvar_fc"]["kernel"]
              + params["logvar_fc"]["bias"])

    tin = torch.from_numpy(vae_in).permute(0, 3, 1, 2)
    with torch.no_grad():
        te = tm.vae_encoder(tin).reshape(1, -1)
        mu_t = tm.mu_fc(te).numpy()
        lv_t = tm.logvar_fc(te).numpy()

    perm = _latent_perm(8, 8)
    np.testing.assert_allclose(np.asarray(mu_our), mu_t[:, perm],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lv_our), lv_t[:, perm],
                               atol=2e-4, rtol=1e-3)


def test_vae_decoder_parity(ported):
    import torch

    tm, _sd, params, batch_stats, _v, _ = ported
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        _VAEDecoder,
    )
    rng = np.random.RandomState(3)
    z_t = rng.uniform(-1, 1, (1, 16, 8, 8)).astype(np.float32)
    z_our = np.transpose(z_t, (0, 2, 3, 1))

    dec = _VAEDecoder(dtype=jnp.float32)
    out = dec.apply(
        {"params": params["vae_decoder"],
         "batch_stats": batch_stats["vae_decoder"]},
        jnp.asarray(z_our), train=False)
    with torch.no_grad():
        t_out = tm.vae_decoder(torch.from_numpy(z_t))
    t_out = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-4, rtol=1e-3)


def test_ported_full_forward_runs(ported):
    _tm, _sd, params, batch_stats, _v, (rgb, seg, gt_rgb, gt_seg) = ported
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        VAEHRNet,
    )
    ours = VAEHRNet(syn_type="inter", dtype=jnp.float32)
    out = ours.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rgb), jnp.asarray(seg), jnp.asarray(gt_rgb),
        jnp.asarray(gt_seg), train=True,
        rngs={"noise": jax.random.PRNGKey(7)},
        mutable=["batch_stats"])
    (rgb_out, seg_out, mu, logvar), _ = out
    for t in (rgb_out, seg_out, mu, logvar):
        assert np.all(np.isfinite(np.asarray(t, np.float32)))
