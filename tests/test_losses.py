"""Losses/metrics vs. independently-written torch golden implementations.

The golden values are computed with torch (CPU) from the mathematical
definitions the reference uses (losses.py:18-151) — standard SSIM with an
11x11 gaussian window, per-sample PSNR, gradient-difference L1, softmax CE —
so these tests pin numerical parity without copying reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deep_video_interpolation_extrapolation_tpu.losses import image as L
from deep_video_interpolation_extrapolation_tpu.losses.gan import (
    bce_gan_loss,
    gan_scalar_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.vae import kld_loss


def _rand(shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.RandomState(seed)
    return rng.uniform(lo, hi, shape).astype(np.float32)


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    # standard SSIM: 2-D gaussian window, grouped conv, zero 'same' padding
    c = img1.shape[1]
    xs = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).float()
    win2d = (g[:, None] @ g[None, :]).expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2

    def blur(x):
        return F.conv2d(x, win2d, padding=pad, groups=c)

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


class TestSSIM:
    def test_matches_torch(self):
        a = _rand((2, 16, 24, 3), 0)
        b = _rand((2, 16, 24, 3), 1)
        ours = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = _torch_ssim(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(b).permute(0, 3, 1, 2),
        )
        assert abs(ours - ref) < 1e-5, (ours, ref)

    def test_identical_images(self):
        a = _rand((1, 16, 16, 3), 2)
        assert float(L.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)
        assert float(L.ssim_loss(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(0.0, abs=1e-5)


class TestPSNR:
    def test_matches_manual(self):
        a = _rand((3, 8, 8, 3), 0)
        b = _rand((3, 8, 8, 3), 1)
        ours = float(L.psnr(jnp.asarray(a), jnp.asarray(b)))
        # per-sample 10*log10(1/mse), then mean (reference losses.py:108-116)
        mse = ((a - b) ** 2).reshape(3, -1).mean(axis=1)
        ref = float(np.mean(10 * np.log10(1.0 / mse)))
        assert abs(ours - ref) < 1e-4

    def test_known_value(self):
        a = np.zeros((1, 4, 4, 1), np.float32)
        b = np.full_like(a, 0.1)
        assert float(L.psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(20.0, abs=1e-3)


class TestGDL:
    def test_matches_torch(self):
        a = _rand((2, 8, 10, 3), 0)
        b = _rand((2, 8, 10, 3), 1)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        # |Δw(pred)-Δw(gt)| and |Δh(pred)-Δh(gt)| halves
        pw = ta[:, :, 1:] - ta[:, :, :-1]
        gw = tb[:, :, 1:] - tb[:, :, :-1]
        ph = ta[:, 1:] - ta[:, :-1]
        gh = tb[:, 1:] - tb[:, :-1]
        ref = ((pw - gw).abs().mean() + (ph - gh).abs().mean()).item() / 2
        ours = float(L.gdl_loss(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ours - ref) < 1e-6

    def test_zero_for_equal(self):
        a = _rand((1, 6, 6, 2), 3)
        assert float(L.gdl_loss(jnp.asarray(a), jnp.asarray(a))) == 0.0


class TestCrossEntropy:
    def test_matches_torch(self):
        logits = _rand((2, 6, 8, 20), 0, -2, 2)
        ids = np.random.RandomState(1).randint(0, 20, (2, 6, 8))
        ours = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(ids)))
        ref = F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(ids).long(),
        ).item()
        assert abs(ours - ref) < 1e-5


class TestIoUAccuracy:
    def test_pixel_accuracy(self):
        pred = np.array([[0, 1], [2, 3]])
        gt = np.array([[0, 1], [2, 0]])
        assert float(L.iou_accuracy(jnp.asarray(pred), jnp.asarray(gt))) == pytest.approx(0.75)


class TestKLD:
    def test_matches_formula(self):
        mu = _rand((2, 16), 0, -1, 1)
        logvar = _rand((2, 16), 1, -1, 1)
        ours = float(kld_loss(jnp.asarray(mu), jnp.asarray(logvar), weight=1.0))
        # -0.5 * sum(1 + logvar - mu^2 - exp(logvar)) / batch (losses.py:50-60)
        ref = float(-0.5 * np.sum(1 + logvar - mu ** 2 - np.exp(logvar)) / mu.shape[0])
        assert ours == pytest.approx(ref, rel=1e-4)


class TestGANLosses:
    def test_hinge_d(self):
        real = jnp.asarray(_rand((4,), 0, -2, 2))
        fake = jnp.asarray(_rand((4,), 1, -2, 2))
        # D loss: mean(relu(1-real)) + mean(relu(1+fake)) — GANScalarLoss
        d_real = float(gan_scalar_loss(real, target_is_real=True))
        d_fake = float(gan_scalar_loss(fake, target_is_real=False))
        assert d_real == pytest.approx(float(np.mean(np.maximum(0, 1 - np.asarray(real)))), abs=1e-6)
        assert d_fake == pytest.approx(float(np.mean(np.maximum(0, 1 + np.asarray(fake)))), abs=1e-6)

    def test_hinge_g(self):
        # G loss = mean(relu(1 - D(fake))), the reference's saturated hinge
        fake = jnp.asarray(_rand((4,), 2, -2, 2))
        g = float(gan_scalar_loss(fake, target_is_real=True))
        assert g == pytest.approx(float(np.mean(np.maximum(0, 1 - np.asarray(fake)))), abs=1e-6)

    def test_bce(self):
        p = jnp.asarray(_rand((2, 3), 0, 0.01, 0.99))
        ours = float(bce_gan_loss([p], target_is_real=True))
        ref = F.binary_cross_entropy(
            torch.from_numpy(np.asarray(p)), torch.ones(2, 3)
        ).item()
        assert abs(ours - ref) < 1e-5


class TestSharpness:
    def test_zero_for_equal(self):
        a = jnp.asarray(_rand((1, 10, 10, 3), 0))
        assert float(L.sharpness_loss(a, a)) == pytest.approx(0.0, abs=1e-7)
