"""Standalone shifted-add kernel vs the XLA tap composition.

Interpret mode on CPU; the compiled form is exercised on TPU by the
bench (hrnet._finish_taps routes through it by default there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import pallas_shiftadd as S
from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
    taps_shifted_add,
)


def _mk(b, h, w, co, seed=0):
    rng = np.random.RandomState(seed)
    yt = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 9 * co)), jnp.float32)
    b2 = jnp.asarray(rng.uniform(-1, 1, (co,)), jnp.float32)
    return yt, b2


@pytest.mark.parametrize("shape", [(1, 16, 64, 23), (2, 32, 64, 12)])
def test_matches_ref_and_xla(shape):
    b, h, w, co = shape
    yt, b2 = _mk(b, h, w, co)
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(S._impl(yt, b2, interpret=interpret))
    ref = np.asarray(S._ref(yt, b2))
    xla = np.asarray(taps_shifted_add(yt, co) + b2)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out, xla, atol=1e-4, rtol=1e-4)


def test_edge_rows_zero_padded():
    """First/last output rows must see conv SAME zero padding, not wrap."""
    b, h, w, co = 1, 16, 64, 4
    yt, b2 = _mk(b, h, w, co, seed=3)
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(S._impl(yt, b2, interpret=interpret))
    ref = np.asarray(S._ref(yt, b2))
    np.testing.assert_allclose(out[:, 0], ref[:, 0], atol=1e-5)
    np.testing.assert_allclose(out[:, -1], ref[:, -1], atol=1e-5)
    np.testing.assert_allclose(out[:, :, 0], ref[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(out[:, :, -1], ref[:, :, -1], atol=1e-5)


def test_gradients_flow_via_ref():
    yt, b2 = _mk(1, 16, 64, 4, seed=5)
    if jax.default_backend() != "tpu":
        # fwd runs the compiled kernel; bwd (the XLA ref vjp) is
        # backend-agnostic — check it alone off-TPU
        g = jax.grad(lambda y: jnp.sum(S._ref(y, b2) ** 2))(yt)
    else:
        g = jax.grad(lambda y: jnp.sum(S.shifted_add_bias(y, b2) ** 2))(yt)
    gr = jax.grad(lambda y: jnp.sum(
        (taps_shifted_add(y, 4) + b2) ** 2))(yt)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=1e-4, rtol=1e-4)


def test_fits_gate():
    yt, _ = _mk(1, 16, 128, 23)
    assert S.fits(yt, 23)
    assert not S.fits(yt, 22)          # lane count mismatch
    assert not S.fits(yt[:, :8], 23)   # too few row tiles
