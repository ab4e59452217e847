"""Torch-oracle parity for the GAN-stack porters (tools/torch_port):
Frame/Video discriminators (global + local, incl. BatchNorm running
stats), the TrackGen patch U-Net, and the full InterGANTrainer checkpoint
convert-load (runners/InterGANTrainer.py:910-938 format)."""

import argparse
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "nets")),
    reason="reference tree not mounted")


def _load_ref(relpath, name):
    """Load a reference nets/ module standalone (stub unused deps)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    # FrameDisc/VidDisc do `from nets.SpectralNorm import SpectralNorm`
    if "nets" not in sys.modules:
        pkg = types.ModuleType("nets")
        pkg.__path__ = [os.path.join(REF_DIR, "nets")]
        sys.modules["nets"] = pkg
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**kw):
    base = dict(seg_disc=True, num_track_per_img=4, rank=0,
                input_h=128, input_w=128)
    base.update(kw)
    return argparse.Namespace(**base)


def _sd(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def _check_leafcount(sd, params, batch_stats):
    n_ours = (len(jax.tree_util.tree_leaves(params))
              + len(jax.tree_util.tree_leaves(batch_stats)))
    n_torch = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_ours == n_torch, (n_ours, n_torch)


@pytest.mark.parametrize("local", [False, True])
def test_frame_disc_parity(local):
    import torch

    from deep_video_interpolation_extrapolation_tpu.models import (
        discriminators as dd,
    )
    from deep_video_interpolation_extrapolation_tpu.tools import torch_port

    ref = _load_ref("nets/FrameDisc.py", "ref_framedisc")
    torch.manual_seed(0)
    tm = (ref.FrameLocalDiscriminator if local
          else ref.FrameDiscriminator)(_args())
    tm.eval()
    sd = _sd(tm)

    ours = (dd.FrameLocalDiscriminator if local
            else dd.FrameDiscriminator)(seg_disc=True, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    # global disc: AvgPool2d(8) after 4 downsamples assumes 128x128
    # (nets/FrameDisc.py:67); the local variant is size-free
    b, h, w = 1, 64, 64 if local else 128
    if not local:
        h = 128
    x = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    seg = np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(seg), train=False)
    porter = (torch_port.port_frame_local_disc if local
              else torch_port.port_frame_disc)
    params, bs = porter(sd, variables["params"],
                        variables.get("batch_stats", {}))
    _check_leafcount(sd, params, bs)

    out = ours.apply({"params": params, "batch_stats": bs},
                     jnp.asarray(x), jnp.asarray(seg), train=False)
    tin = torch.from_numpy(np.concatenate([x, seg], -1)).permute(0, 3, 1, 2)
    with torch.no_grad():
        t_out = tm(tin[:, :3], tin[:, 3:])
    if local:
        np.testing.assert_allclose(np.asarray(out), _nhwc(t_out),
                                   atol=2e-4, rtol=1e-3)
    else:
        # reference pools AvgPool2d(8) then channel-means — equal to the
        # global mean at pool-divisible sizes (nets/FrameDisc.py:66-75)
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("local", [False, True])
def test_video_disc_parity(local):
    import torch

    from deep_video_interpolation_extrapolation_tpu.models import (
        discriminators as dd,
    )
    from deep_video_interpolation_extrapolation_tpu.tools import torch_port

    ref = _load_ref("nets/VidDisc.py", "ref_viddisc")
    torch.manual_seed(0)
    tm = (ref.VideoLocalDiscriminator if local
          else ref.VideoDiscriminator)(_args())
    tm.eval()
    sd = _sd(tm)

    ours = (dd.VideoLocalDiscriminator if local
            else dd.VideoDiscriminator)(seg_disc=True, dtype=jnp.float32)
    rng = np.random.RandomState(2)
    b, h, w = (1, 64, 64) if local else (1, 128, 128)
    x = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    seg = np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
    in_x = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    in_seg = np.concatenate(
        [np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
         for _ in range(2)], -1)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seg),
        jnp.asarray(in_x), jnp.asarray(in_seg), train=False)
    porter = (torch_port.port_video_local_disc if local
              else torch_port.port_video_disc)
    params, bs = porter(sd, variables["params"],
                        variables.get("batch_stats", {}))
    _check_leafcount(sd, params, bs)

    out = ours.apply({"params": params, "batch_stats": bs},
                     jnp.asarray(x), jnp.asarray(seg), jnp.asarray(in_x),
                     jnp.asarray(in_seg), train=False)

    def t(a):
        return torch.from_numpy(a).permute(0, 3, 1, 2)

    with torch.no_grad():
        # reference concat order: [x, seg, input_x, input_seg]
        # (nets/VidDisc.py:80); ours matches
        t_out = tm(t(x), t(seg), t(in_x), t(in_seg))
    if local:
        np.testing.assert_allclose(np.asarray(out), _nhwc(t_out),
                                   atol=2e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("v2", [False, True])
def test_trackgen_unet_parity(v2, monkeypatch):
    """The ported TrackGen patch U-Net reproduces the torch encoder/decoder
    stack on a raw 64x64 patch (the crop/paste ROI semantics around it are
    fixed-shape reformulations tested separately in test_detdisc)."""
    import torch

    from deep_video_interpolation_extrapolation_tpu.models.trackgen import (
        _TrackUNet,
    )
    from deep_video_interpolation_extrapolation_tpu.tools import torch_port

    ref = _load_ref("nets/TrackGen.py", "ref_trackgen")
    # TrackGenV2.__init__ .cuda()s its coordinate grid (nets/TrackGen.py:311)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    torch.manual_seed(0)
    tm = (ref.TrackGenV2 if v2 else ref.TrackGen)(_args())
    tm.eval()
    sd = _sd(tm)

    ours = _TrackUNet(out_extra=2 if v2 else 0, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    cin = 50 if v2 else 46   # V2 prepends 2+2 coordinate channels
    x = rng.uniform(-1, 1, (2, 64, 64, cin)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    fake_full = {"unet": variables["params"],
                 "head": _head_params(tm, v2)}
    ported = torch_port.port_track_gen(sd, fake_full)
    out = ours.apply({"params": ported["unet"]}, jnp.asarray(x))

    tin = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        e1 = tm.encoder_1(tin)
        e2 = tm.encoder_2(e1)
        e3 = tm.encoder_3(e2)
        e4 = tm.encoder_4(e3)
        b = tm.bottom_layer(e4)
        h = tm.up_4(b)
        h = tm.decoder_4(torch.cat([h, e4], 1))
        h = tm.up_3(h)
        h = tm.decoder_3(torch.cat([h, e3], 1))
        h = tm.up_2(h)
        h = tm.decoder_2(torch.cat([h, e2], 1))
        h = tm.up_1(h)
        h = tm.decoder_1(torch.cat([h, e1], 1))
    np.testing.assert_allclose(np.asarray(out), _nhwc(h),
                               atol=3e-4, rtol=1e-3)


def _head_params(tm, v2):
    """Init a matching _FusionHead tree so port_track_gen can fill it."""
    from deep_video_interpolation_extrapolation_tpu.models.trackgen import (
        _FusionHead,
    )
    head = _FusionHead(num_track=4, dtype=jnp.float32)
    n = 4
    feats = jnp.zeros((1, 16, 16, 32 * n), jnp.float32)
    rgbc = jnp.zeros((1, 16, 16, 3), jnp.float32)
    segc = jnp.zeros((1, 16, 16, 20), jnp.float32)
    mask = jnp.zeros((1, 16, 16, 1), jnp.float32)
    return head.init(jax.random.PRNGKey(1), feats, rgbc, segc, mask)["params"]


def test_full_gan_checkpoint_convert_loads(tmp_path):
    """A reference InterGANTrainer checkpoint dict (VAEHRNet coarse +
    TrackGen + all four discriminator families,
    runners/InterGANTrainer.py:910-938) convert-loads through
    port_reference_checkpoint into the GAN composite's state."""
    import torch

    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_reference_checkpoint,
    )
    from deep_video_interpolation_extrapolation_tpu.train import inter_gan

    from test_hrnet_parity import _load_ref_hrnet
    ref_hr = _load_ref_hrnet()
    ref_fd = _load_ref("nets/FrameDisc.py", "ref_framedisc_g")
    ref_vd = _load_ref("nets/VidDisc.py", "ref_viddisc_g")
    ref_tg = _load_ref("nets/TrackGen.py", "ref_trackgen_g")

    targs = _args(syn_type="inter", mode="xs2xs", num_pred_once=1,
                  inpaint=False, inpaint_mask=False, highres_large=False,
                  fix_init_frames=False)
    torch.manual_seed(0)
    ckpt = {
        "session": 1,
        "epoch": 5,
        "coarse_model": ref_hr.VAEHRNet(targs).state_dict(),
        "track_gen_model": ref_tg.TrackGen(targs).state_dict(),
        "frame_disc_model": ref_fd.FrameDiscriminator(targs).state_dict(),
        "frame_det_disc_model":
            ref_fd.FrameLocalDiscriminator(targs).state_dict(),
        "video_disc_model": ref_vd.VideoDiscriminator(targs).state_dict(),
        "video_det_disc_model":
            ref_vd.VideoLocalDiscriminator(targs).state_dict(),
    }

    cfg = Config(
        runner="INTER", model="InterGANNet", syn_type="inter", mode="xs2xs",
        coarse_model="VAEHRNet", vae=True, gan=True, seg_disc=True,
        track_gen=True, track_gen_model="TrackGen",
        frame_disc=True, frame_det_disc=True, video_disc=True,
        video_det_disc=True,
        frame_disc_model="FrameDiscriminator",
        frame_det_disc_model="FrameLocalDiscriminator",
        video_disc_model="VideoDiscriminator",
        video_det_disc_model="VideoLocalDiscriminator",
        train_coarse=True, compute_dtype="float32",
        input_h=128, input_w=128, batch_size=1, dataset="synthetic")
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        1, 128, 128, n_track=4, seed=0).items()}
    variables = inter_gan.init_variables(cfg, jax.random.PRNGKey(0), batch)
    params, bs = port_reference_checkpoint(
        ckpt, variables["params"], variables.get("batch_stats", {}))
    # every submodel converted: spot-check a leaf actually changed
    for name in ("coarse_model", "track_gen_model", "frame_disc_model",
                 "video_disc_model"):
        a = jax.tree_util.tree_leaves(variables["params"][name])
        b = jax.tree_util.tree_leaves(params[name])
        assert any(not np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), name
