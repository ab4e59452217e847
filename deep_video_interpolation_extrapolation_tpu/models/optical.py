"""Voxel-flow style warp networks (reference nets/OpticalUnet.py).

``OpticalUnet`` predicts forward/backward flows + occlusion masks from two
frames, backward-warps both inputs with the ``ops/warp.py`` grid-sample core
(border padding, matching F.grid_sample(padding_mode='border') at
nets/OpticalUnet.py:132-139), and masks the two warped outputs.
``RefineUnet`` fuses the two masked warps into the final mid-frame.

Reference bugs fixed here (documented per SURVEY §2.7):
- ``input[:6]`` → the channel slice ``input[:, :6]`` (nets/OpticalUnet.py:100);
- undefined ``coor_x_2/coor_y_2`` → the backward branch uses
  ``grid + back_flow`` (nets/OpticalUnet.py:129-138 intent).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ConvLReLU,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.warp import (
    grid_sample_border,
    make_base_grid,
)

Dtype = Any


class _WarpUNet(nn.Module):
    """Shared encoder/decoder skeleton for OpticalUnet/RefineUnet."""
    out_dim: int
    widths: tuple = (32, 64, 128, 256)
    bottom: int = 512
    enc_kernels: tuple = (7, 5, 3, 3)
    enc_convs: tuple = (3, 4, 4, 4)
    dec_convs: int = 4
    out_kernel: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        skips = []
        h = x
        for li, (w, k, n) in enumerate(zip(self.widths, self.enc_kernels, self.enc_convs)):
            stride = 2 if li > 0 else 1
            h = ConvLReLU(w, k, stride=stride, dtype=d, name=f"encoder_{li + 1}_0")(h)
            for ci in range(1, n):
                h = ConvLReLU(w, k, dtype=d, name=f"encoder_{li + 1}_{ci}")(h)
            skips.append(h)
        h = ConvLReLU(self.bottom, 3, stride=2, dtype=d, name="bottom_0")(h)
        for ci in range(1, self.dec_convs):
            h = ConvLReLU(self.bottom, 3, dtype=d, name=f"bottom_{ci}")(h)
        for li in range(len(self.widths) - 1, -1, -1):
            w = self.widths[li]
            h = lrelu(ConvT(w, dtype=d, name=f"up_{li + 1}")(h))
            h = jnp.concatenate([h, skips[li]], axis=-1)
            for ci in range(self.dec_convs):
                h = ConvLReLU(w, 3, dtype=d, name=f"decoder_{li + 1}_{ci}")(h)
        return Conv(self.out_dim, self.out_kernel, dtype=d, name="output_layer")(h)


class OpticalUnet(nn.Module):
    """Flow/mask predictor + double backward-warp (nets/OpticalUnet.py:31-148).

    Call: rgb (B,H,W,6) two frames.  Returns
    (for_output, for_flow, for_mask, back_output, back_flow, back_mask);
    outputs are already mask-multiplied like the reference.
    """
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, train: bool = True):
        b, h, w, _ = rgb.shape
        out = jnp.tanh(_WarpUNet(out_dim=6, dtype=self.dtype, name="unet")(rgb[..., :6]))
        for_flow = out[..., 0:2]
        for_mask = out[..., 2:3]
        back_flow = out[..., 3:5]
        back_mask = out[..., 5:6]

        base = make_base_grid(h, w)[None]
        for_grid = base - for_flow.astype(jnp.float32)
        back_grid = base + back_flow.astype(jnp.float32)
        for_out = grid_sample_border(rgb[..., 0:3], for_grid)
        back_out = grid_sample_border(rgb[..., 3:6], back_grid)

        for_mask = 0.5 * (1.0 + for_mask)
        back_mask = 0.5 * (1.0 + back_mask)
        for_out = for_out * for_mask
        back_out = back_out * back_mask
        return for_out, for_flow, for_mask, back_out, back_flow, back_mask


class RefineUnet(nn.Module):
    """Warp-fusion refine U-Net (nets/OpticalUnet.py:151-232).

    Call: (img1, mask1, img2, mask2) -> fused rgb.
    """
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, img1, mask1=None, img2=None, mask2=None, train: bool = True):
        parts = [p for p in (img1, mask1, img2, mask2) if p is not None]
        x = jnp.concatenate(parts, axis=-1)
        return _WarpUNet(
            out_dim=3, widths=(32, 64, 128, 256), bottom=256,
            enc_kernels=(3, 3, 3, 3), enc_convs=(3, 3, 3, 3), dec_convs=3,
            out_kernel=3, dtype=self.dtype, name="unet",
        )(x)


class OpticalRefineNet(nn.Module):
    """OpticalUnet + RefineUnet composite (nets/OpticalUnet.py:18-28)."""
    dtype: Optional[Dtype] = None

    def setup(self):
        self.coarse_model = OpticalUnet(dtype=self.dtype)
        self.refine_model = RefineUnet(dtype=self.dtype)

    def __call__(self, rgb, train: bool = True):
        for_out, for_flow, for_mask, back_out, back_flow, back_mask = \
            self.coarse_model(rgb, train=train)
        output = self.refine_model(for_out, for_mask, back_out, back_mask, train=train)
        return output, for_out, for_flow, for_mask, back_out, back_flow, back_mask
