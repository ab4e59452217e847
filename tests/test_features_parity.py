"""Perceptual-net parity: load torch-format VGG19 weights and compare the
full 5-stage feature pyramid against a torch execution of the same weights
(avg-pool variant, reference nets/vgg.py:5-55)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from deep_video_interpolation_extrapolation_tpu.models.features import (
    VGG19_PLAN,
    VGG19Features,
    imagenet_norm,
    load_torch_vgg19_state,
)

CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]


def _fake_torch_vgg19_state(seed=0):
    rng = np.random.RandomState(seed)
    state = {}
    cin = 3
    chans = [c for blk in VGG19_PLAN for c in blk]
    for tid, cout in zip(CONV_IDS, chans):
        state[f"features.{tid}.weight"] = rng.normal(
            0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        state[f"features.{tid}.bias"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
        cin = cout
    return state


def _torch_forward(state, x_nchw):
    """Reference my_vgg structure: per-block convs+relu, avg-pool between."""
    feats = []
    h = x_nchw
    i = 0
    for bi, blk in enumerate(VGG19_PLAN):
        if bi > 0:
            h = F.avg_pool2d(h, 2, 2)
        for _ in blk:
            tid = CONV_IDS[i]
            w = torch.from_numpy(state[f"features.{tid}.weight"])
            b = torch.from_numpy(state[f"features.{tid}.bias"])
            h = F.relu(F.conv2d(h, w, b, padding=1))
            i += 1
        feats.append(h)
    return feats


def test_vgg19_weight_port_parity():
    state = _fake_torch_vgg19_state()
    model = VGG19Features(dtype=jnp.float32)
    x = np.random.RandomState(1).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torch_vgg19_state(variables, state)
    ours = model.apply(variables, jnp.asarray(x))

    ref = _torch_forward(state, torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(ours) == len(ref) == 5
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3)


def test_imagenet_norm():
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.asarray(imagenet_norm(x))
    expect = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-6)
