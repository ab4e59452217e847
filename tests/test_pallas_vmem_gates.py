"""Batch-aware VMEM/layout gates for the HWNC Pallas kernels.

The HWNC logical form (H, W/2, B, fC) keeps the WHOLE batch inside every
kernel block (B is an inner dim of the physical layout), so per-program
VMEM scales linearly with batch.  The round-3 batch sweep (tb_r3b log,
ingested in docs/ABLOG_r3.md) produced two distinct TPU-only failures
invisible to the CPU suite:

  * bs16 at the transition1 call site (x = (512, 512, 16, 512) f2)
    crashed with "Ran out of memory in memory space vmem. Used 191.86M
    of 128.00M" — 96 MiB of double-buffered scratch + 79.9 MiB of
    register spills.  The SHIPPING bs8 envelope at that same site is
    exactly 48 MiB scratch / 16 MiB dot rows, so the gates cap there
    (inclusive) and shrink the row-tile for bigger batches.
  * bs12 died in Mosaic ("Slice shape along dimension 2 must be
    aligned to tiling (8), but is 12") — B is the second-minor dim of
    the (8,128)-tiled layout, so b % 8 != 0 must reject.

Over-budget shapes return th=0 / fits=False -> the model's XLA
fallback, so any batch size RUNS.
"""

import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.ops import (
    pallas_ae_conv,
    pallas_chain,
    pallas_fuse0,
)


def _x(h, wp, b, fc, dt=jnp.bfloat16):
    return jnp.zeros((h, wp, b, fc), dt)


class TestAeConvGate:
    def test_validated_envelope_keeps_th4(self):
        # 8x512x1024 f2: the shipped config must keep its measured
        # tiling at BOTH the fc=128 chain sites and the fc=512
        # transition1 site (scratch exactly 48 MiB — the budget is
        # calibrated to admit it).
        assert pallas_ae_conv._pick_th(512, 512, 8, 128, 2) == 4
        assert pallas_ae_conv._pick_th(512, 512, 8, 512, 2) == 4
        assert pallas_ae_conv.hwnc_fits(_x(512, 512, 8, 128))
        assert pallas_ae_conv.hwnc_fits(_x(512, 512, 8, 512))

    def test_bs16_fc512_shrinks_th_instead_of_crashing(self):
        # the crash shape: th=4 scratch is 96 MiB; th=1 is exactly the
        # shipping 48 MiB again
        assert pallas_ae_conv._pick_th(512, 512, 16, 512, 2) == 1
        assert pallas_ae_conv.hwnc_fits(_x(512, 512, 16, 512))

    def test_bs16_fc128_keeps_th4(self):
        # the fc=128 sites were never the problem (24 MiB at th=4)
        assert pallas_ae_conv._pick_th(512, 512, 16, 128, 2) == 4
        assert pallas_ae_conv.hwnc_fits(_x(512, 512, 16, 128))

    def test_non_multiple_of_8_batch_rejected(self):
        # Mosaic slice-alignment failure class (bs12 sweep log)
        assert not pallas_ae_conv.hwnc_fits(_x(512, 512, 12, 128))
        assert not pallas_ae_conv.hwnc_fits(_x(512, 512, 4, 128))

    def test_huge_batch_rejected(self):
        assert pallas_ae_conv._pick_th(512, 512, 32, 512, 2) == 0
        assert not pallas_ae_conv.hwnc_fits(_x(512, 512, 32, 512))

    def test_geometry_free_call_unchanged(self):
        assert pallas_ae_conv._pick_th(512) == 4


class TestChainGate:
    def test_validated_envelope_fits(self):
        # bs8 layer1: th=2 -> 8.4 MiB scratch + 37.7 MiB tiles
        assert pallas_chain._pick_th(512, 512, 8, 128, 512, 512, 128, 2) == 2
        assert pallas_chain.block_fits(_x(512, 512, 8, 128))

    def test_bs16_shrinks_or_rejects(self):
        th16 = pallas_chain._pick_th(512, 512, 16, 128, 512, 512, 128, 2)
        assert 0 < th16 < 2  # th=2 doubles resident tiles past budget

    def test_non_multiple_of_8_batch_rejected(self):
        assert not pallas_chain.block_fits(_x(512, 512, 12, 128))

    def test_huge_batch_rejected(self):
        assert not pallas_chain.block_fits(_x(512, 512, 64, 128))


class TestFuse0Gate:
    def test_validated_envelope_fits(self):
        y0 = _x(512, 512, 8, 128)
        t1 = _x(256, 512, 8, 64)
        assert pallas_fuse0.fits_hwnc(y0, t1)

    def test_bs16_fits(self):
        # fuse0's resident tiles at bs16/th=4 are ~24 MiB — still fine
        y0 = _x(512, 512, 16, 128)
        t1 = _x(256, 512, 16, 64)
        assert pallas_fuse0.fits_hwnc(y0, t1)

    def test_non_multiple_of_8_batch_rejected(self):
        y0 = _x(512, 512, 12, 128)
        t1 = _x(256, 512, 12, 64)
        assert not pallas_fuse0.fits_hwnc(y0, t1)

    def test_huge_batch_rejected(self):
        y0 = _x(512, 512, 256, 128)
        t1 = _x(256, 512, 256, 64)
        assert not pallas_fuse0.fits_hwnc(y0, t1)


def test_model_routes_around_rejected_gates():
    """A forward at a batch the kernels reject must still produce output
    (XLA fallback), identically shaped to the small-batch route."""
    import jax

    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry

    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="float32",
        input_h=16, input_w=32, batch_size=2, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    rgb = jnp.zeros((2, 16, 32, 6), jnp.float32)
    seg = jnp.zeros((2, 16, 32, 40), jnp.float32)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)
    out_rgb, out_seg = model.apply(variables, rgb, seg, train=False)
    assert out_rgb.shape == (2, 16, 32, 3)
    assert out_seg.shape == (2, 16, 32, 20)
