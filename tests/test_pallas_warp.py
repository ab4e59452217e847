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


def test_tile_boundary_fractional_max_disp():
    """Regression: displacement in (r, r+1) at the LAST row of an interior
    row tile.  The dy = r+1 tap used to wrap (mod slab rows) to slab row 0
    — image row ti*th - r — leaking data from 2r rows away instead of the
    correct bilinear pair.  Needs h > tile (64) so interior tiles exist."""
    rng = np.random.RandomState(2)
    b, h, w, c = 1, 192, 128, 1
    r = 8
    x = rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32)
    base = np.asarray(make_base_grid(h, w))[None]
    # uniform +8.5 px displacement in y: every pixel samples between its
    # dy=r and dy=r+1 taps
    grid = (base + np.array([0.0, 8.5 * 2.0 / (h - 1)], np.float32)
            ).astype(np.float32)
    out = grid_sample_pallas(jnp.asarray(x), jnp.asarray(grid), max_disp=r,
                             interpret=True)
    ref = _torch_ref(x, grid)
    # torch samples beyond the window bound are exact here because 8.5 < r+1
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_bfloat16_inputs():
    """The default compute dtype is bfloat16: the slab must carry the
    input dtype (a bf16 -> f32 async copy fails at lowering)."""
    rng = np.random.RandomState(3)
    b, h, w, c = 1, 16, 32, 3
    x = rng.uniform(-1, 1, (b, h, w, c)).astype(np.float32)
    base = np.asarray(make_base_grid(h, w))[None]
    flow = rng.uniform(-3, 3, (b, h, w, 2)).astype(np.float32)
    grid = (base + flow * np.array([2.0 / (w - 1), 2.0 / (h - 1)])
            ).astype(np.float32)
    out = grid_sample_pallas(jnp.asarray(x, jnp.bfloat16), jnp.asarray(grid),
                             max_disp=4, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _torch_ref(x, grid)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=3e-2, rtol=3e-2)
