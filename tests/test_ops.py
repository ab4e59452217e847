"""Core ops vs torch golden behavior.

- ``grid_sample`` / ``grid_sample_border`` vs ``F.grid_sample``
  (align_corners=True — the torch-1.x default the reference was pinned to,
  utils/net_utils.py:100-114, nets/OpticalUnet.py:123-139).
- ``interpolate_bilinear`` vs ``F.interpolate`` in both align_corners modes.
- ``backward_warp`` semantics: grid = base - flow.
- ``avg_pool``/``max_pool`` vs torch pooling.
- ROI crop_resize fixed-size patch extraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deep_video_interpolation_extrapolation_tpu.ops import corr as corr_ops
from deep_video_interpolation_extrapolation_tpu.ops import roi as roi_ops
from deep_video_interpolation_extrapolation_tpu.ops import warp as warp_ops
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    avg_pool,
    interpolate_bilinear,
    max_pool,
)


def _rand(shape, seed=0, lo=-1.0, hi=1.0):
    return np.random.RandomState(seed).uniform(lo, hi, shape).astype(np.float32)


class TestGridSample:
    def _compare(self, pad_mode):
        x = _rand((2, 8, 12, 3), 0)
        grid = _rand((2, 8, 12, 2), 1, -1.3, 1.3)  # include out-of-bounds
        if pad_mode == "zeros":
            ours = warp_ops.grid_sample(jnp.asarray(x), jnp.asarray(grid))
        else:
            ours = warp_ops.grid_sample_border(jnp.asarray(x), jnp.asarray(grid))
        ref = F.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode=pad_mode,
            align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_zeros_padding(self):
        self._compare("zeros")

    def test_border_padding(self):
        self._compare("border")

    def test_identity_grid(self):
        x = _rand((1, 6, 6, 2), 2)
        base = warp_ops.make_base_grid(6, 6)[None]
        out = warp_ops.grid_sample(jnp.asarray(x), base)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


class TestBackwardWarp:
    def test_zero_flow_is_identity(self):
        x = _rand((2, 8, 8, 3), 0)
        flow = np.zeros((2, 8, 8, 2), np.float32)
        out = warp_ops.backward_warp(jnp.asarray(x), jnp.asarray(flow))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)

    def test_matches_torch_grid_minus_flow(self):
        # reference FlowWrapper: grid = base - flow (utils/net_utils.py:109-114)
        x = _rand((1, 8, 10, 3), 1)
        flow = _rand((1, 8, 10, 2), 2, -0.2, 0.2)
        ours = warp_ops.backward_warp(jnp.asarray(x), jnp.asarray(flow))
        base = np.asarray(warp_ops.make_base_grid(8, 10))[None]
        ref = F.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(base - flow),
            mode="bilinear", padding_mode="zeros", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("size", [(16, 20), (4, 5), (7, 13)])
    def test_matches_torch(self, align, size):
        x = _rand((2, 8, 10, 3), 0)
        ours = interpolate_bilinear(jnp.asarray(x), size=size, align_corners=align)
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
            mode="bilinear", align_corners=align,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_identity(self):
        x = _rand((1, 8, 8, 2), 1)
        out = interpolate_bilinear(jnp.asarray(x), size=(8, 8))
        np.testing.assert_array_equal(np.asarray(out), x)


class TestPooling:
    def test_avg_pool(self):
        x = _rand((2, 8, 8, 3), 0)
        ours = avg_pool(jnp.asarray(x), (2, 2))
        ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    def test_max_pool(self):
        x = _rand((2, 8, 8, 3), 1)
        ours = max_pool(jnp.asarray(x), (2, 2))
        ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


class TestWindowCorrelation:
    def test_matches_naive_unfold(self):
        """Cosine similarity vs each (dy,dx) shifted neighbor — the op behind
        MSResAttnRefine's corrmap (reference nets/refine_nets.py:253-287)."""
        b, h, w, c = 1, 6, 8, 4
        feat = _rand((b, h, w, c), 0)
        neigh = _rand((b, h, w, c), 1)
        win_h, win_w = 3, 5
        out = np.asarray(corr_ops.window_correlation(
            jnp.asarray(feat), [jnp.asarray(neigh)], win_h=win_h, win_w=win_w))

        def norm(v):
            return v / (np.linalg.norm(v) + 1e-12)

        k = 0
        for dy in range(-(win_h // 2), win_h // 2 + 1):
            for dx in range(-(win_w // 2), win_w // 2 + 1):
                for y in range(h):
                    for x in range(w):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w:
                            expect = float(
                                norm(feat[0, y, x]) @ norm(neigh[0, yy, xx]))
                        else:
                            expect = 0.0
                        assert out[0, y, x, k] == pytest.approx(expect, abs=1e-4), (
                            dy, dx, y, x)
                k += 1

    def test_aggregate_softmax_weights(self):
        """Weighted aggregation of shifted neighbors sums correctly."""
        b, h, w, c = 1, 4, 4, 2
        neigh = _rand((b, h, w, c), 2)
        n_off = 9
        probs = np.random.RandomState(3).uniform(0, 1, (b, h, w, n_off)).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        out = np.asarray(corr_ops.window_aggregate(
            [jnp.asarray(neigh)], jnp.asarray(probs), win_h=3, win_w=3))
        # pixel (1,1): all 9 neighbors valid
        expect = np.zeros(c, np.float32)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                expect += probs[0, 1, 1, k] * neigh[0, 1 + dy, 1 + dx]
                k += 1
        np.testing.assert_allclose(out[0, 1, 1], expect, atol=1e-5)


class TestROI:
    def test_crop_resize_exact_box(self):
        img = _rand((2, 16, 16, 3), 0)
        # box covering the full image -> crop == resized image
        boxes = np.array([[[0, 0, 15, 15]], [[0, 0, 15, 15]]], np.float32)  # (B,1,4)
        out = roi_ops.crop_resize(jnp.asarray(img), jnp.asarray(boxes), (8, 8))
        assert out.shape == (2, 1, 8, 8, 3)
        ref = F.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2), size=(8, 8),
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out[:, 0]), ref, atol=1e-4)

    def test_paste_roundtrip(self):
        img = _rand((1, 16, 16, 3), 1)
        canvas = np.zeros_like(img)
        boxes = np.array([[[2, 3, 9, 12]]], np.float32)
        patches = roi_ops.crop_resize(jnp.asarray(img), jnp.asarray(boxes), (8, 10))
        out = np.asarray(roi_ops.paste_patches(
            jnp.asarray(canvas), patches, jnp.asarray(boxes)))
        # inside the box the canvas holds (approximately) the original pixels
        np.testing.assert_allclose(
            out[0, 2:10, 3:13], img[0, 2:10, 3:13], atol=1e-3)
        # outside untouched
        assert np.all(out[0, :2] == 0) and np.all(out[0, 10:] == 0)


def test_upsample2x_convt_exact():
    """Depthwise-convT 2x bilinear == torch half-pixel semantics (CPU f32
    convs are exact; on TPU it's gated to bf16 where rounding matches)."""
    import torch
    import torch.nn.functional as F
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        upsample2x_convt,
    )

    x = np.random.RandomState(0).randn(2, 9, 14, 5).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         scale_factor=2, mode="bilinear",
                         align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample2x_convt(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class TestTappedConv:
    """ops/tapped_conv.py: taps-in-N 3x3 == direct lax conv (exact math)."""

    @pytest.mark.parametrize("cout", [3, 20, 23])
    def test_matches_direct_conv(self, cout):
        from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
            conv3x3_tapped,
        )
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 9, 13, 37).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 37, cout).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        direct = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        tapped = conv3x3_tapped(x, w, b)
        np.testing.assert_allclose(np.asarray(tapped), np.asarray(direct),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_matches(self):
        from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
            conv3x3_tapped,
        )
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 6, 7, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)

        def loss_direct(w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y ** 2)

        def loss_tapped(w):
            return jnp.sum(conv3x3_tapped(x, w) ** 2)

        gd = jax.grad(loss_direct)(w)
        gt = jax.grad(loss_tapped)(w)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gd),
                                   rtol=2e-4, atol=2e-4)
