"""Pallas warp kernel vs torch grid_sample (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deep_video_interpolation_extrapolation_tpu.ops.pallas_warp import (
    grid_sample_pallas,
)
from deep_video_interpolation_extrapolation_tpu.ops.warp import make_base_grid


def _torch_ref(x, grid):
    return F.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()


def test_matches_torch_small_flow():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 16, 32, 3
    x = rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32)
    base = np.asarray(make_base_grid(h, w))[None]
    # displacement up to ~3 px in each direction
    flow = rng.uniform(-3, 3, (b, h, w, 2)).astype(np.float32)
    grid = (base + flow * np.array([2.0 / (w - 1), 2.0 / (h - 1)])).astype(np.float32)

    out = grid_sample_pallas(jnp.asarray(x), jnp.asarray(grid), max_disp=4,
                             interpret=True)
    ref = _torch_ref(x, grid)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_identity_grid():
    rng = np.random.RandomState(1)
    b, h, w, c = 1, 8, 16, 3
    x = rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32)
    base = np.asarray(make_base_grid(h, w))[None]
    out = grid_sample_pallas(jnp.asarray(x), jnp.asarray(base), max_disp=2,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_out_of_window_is_zero():
    """Samples displaced beyond max_disp produce 0 (documented contract)."""
    b, h, w, c = 1, 8, 16, 1
    x = np.ones((b, h, w, c), np.float32)
    base = np.asarray(make_base_grid(h, w))[None]
    grid = base + np.array([10 * 2.0 / (w - 1), 0.0], np.float32)  # +10 px x
    out = grid_sample_pallas(jnp.asarray(x), jnp.asarray(grid), max_disp=2,
                             interpret=True)
    # interior: true sample exists but is beyond the window -> 0
    assert np.allclose(np.asarray(out)[0, :, :4], 0.0)
