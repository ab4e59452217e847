"""Fused window-attention Pallas kernel vs its XLA oracle (interpret mode
on CPU; the same kernel compiles for real TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops.pallas_corr import (
    fits_vmem,
    fused_window_attention,
    fused_window_attention_reference,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).uniform(-1, 1, shape), jnp.float32)


@pytest.mark.parametrize("win", [(3, 3), (5, 9)])
def test_matches_xla_oracle(win):
    b, h, w, c, cv = 2, 8, 16, 8, 4
    q, k1, k2 = _rand((b, h, w, c), 0), _rand((b, h, w, c), 1), _rand((b, h, w, c), 2)
    v1, v2 = _rand((b, h, w, cv), 3), _rand((b, h, w, cv), 4)
    out, flow = fused_window_attention(
        q, k1, k2, v1, v2, win_h=win[0], win_w=win[1], interpret=True)
    ref_out, ref_flow = fused_window_attention_reference(
        q, k1, k2, v1, v2, win_h=win[0], win_w=win[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(flow), np.asarray(ref_flow))


def test_flow_decodes_known_shift():
    """A neighbor that exactly equals the query shifted by (dy,dx) must be
    found by the argmax flow."""
    b, h, w, c = 1, 8, 8, 6
    q = _rand((b, h, w, c), 5)
    # k1[p] = q[p + (1, 2)]; shift semantics: shifted_k1[p] = k1[p + (dy, dx)]
    # = q[p + (dy+1, dx+2)], equal to q[p] at (dy, dx) = (-1, -2).
    k1 = jnp.roll(q, shift=(-1, -2), axis=(1, 2))
    k2 = _rand((b, h, w, c), 6)
    v = _rand((b, h, w, 3), 7)
    _, flow = fused_window_attention(
        q, k1, k2, v, v, win_h=3, win_w=5, interpret=True)
    inner = np.asarray(flow)[0, 2:-2, 3:-3]
    assert np.all(inner[..., 0] == -2), inner[..., 0]
    assert np.all(inner[..., 1] == -1), inner[..., 1]


def test_fits_vmem_guard():
    assert fits_vmem(64, 128, 128, 128)   # the V1 attention shape
    assert not fits_vmem(64, 128, 64, 64)  # lane-unaligned channels
    assert not fits_vmem(512, 4096, 256, 256)  # too wide per tile


def test_bfloat16_inputs():
    """The default compute dtype is bfloat16: the k/v slabs must carry the
    input dtype (a bf16 -> f32 halo DMA fails at lowering); math still
    accumulates in f32 in-kernel."""
    b, h, w, c, cv = 1, 8, 16, 8, 4
    mk = lambda s, shape: jnp.asarray(
        np.random.RandomState(s).uniform(-1, 1, shape), jnp.bfloat16)
    q, k1, k2 = mk(0, (b, h, w, c)), mk(1, (b, h, w, c)), mk(2, (b, h, w, c))
    v1, v2 = mk(3, (b, h, w, cv)), mk(4, (b, h, w, cv))
    out, flow = fused_window_attention(q, k1, k2, v1, v2, interpret=True)
    assert out.dtype == jnp.bfloat16 and flow.dtype == jnp.float32
    ref_out, ref_flow = fused_window_attention_reference(q, k1, k2, v1, v2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=5e-2, rtol=5e-2)
    # argmax flow can legitimately flip on near-tied similarities under
    # bf16 rounding (the kernel normalizes k in the slab dtype); require
    # agreement on the vast majority of pixels
    flip = np.mean(np.any(np.asarray(flow) != np.asarray(ref_flow), -1))
    assert flip < 0.1, flip
