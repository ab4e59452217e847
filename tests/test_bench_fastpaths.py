"""Shape-fit guard: every default-on Pallas fast path ENGAGES at the
flagship bench shapes (InterNet/HRNet, 8x512x1024 bf16 — bench.py).

The fast paths are each gated by a shape predicate (``fits*``); a model
or kernel refactor that silently un-fits one would fall back to the XLA
composition and lose double-digit fps with no test failing and no error
anywhere.  This test abstractly traces the full-size bench model
(``jax.eval_shape`` — no compute, no TPU) with the backend gates forced
to the TPU answers, spying on every predicate, and asserts each one
fired and returned True.
"""

import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.ops import (
    pallas_ae_conv,
    pallas_chain,
    pallas_fuse0,
    pallas_upshead,
)

BENCH_DEFAULT_ENVS = [
    "DVIE_PALLAS", "DVIE_FUSE0", "DVIE_FUSE0_HWNC", "DVIE_HWNC_L1",
    "DVIE_AE_HWNC", "DVIE_BLOCK_AE", "DVIE_FUSED_HEAD", "DVIE_FUSE_UPS",
    # default-off paths that would change the routing if leaked on
    "DVIE_AE_CONV", "DVIE_FUSED_BLOCK", "DVIE_CHAIN_BOUNDARY",
    "DVIE_PACKED_STAGES", "DVIE_PACKED_AE", "DVIE_HWNC_V1BOUNDARY",
]


def test_bench_fast_paths_engage(monkeypatch):
    for k in BENCH_DEFAULT_ENVS:
        monkeypatch.delenv(k, raising=False)
    # the gates read jax.default_backend(); force the TPU answer (tracing
    # stays abstract — pallas_call is never compiled or run here)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    calls = {}

    def spy(mod, name):
        orig = getattr(mod, name)
        key = f"{mod.__name__.rsplit('.', 1)[-1]}.{name}"

        def wrapper(*a, **kw):
            r = orig(*a, **kw)
            shapes = tuple(getattr(x, "shape", None) for x in a)
            calls.setdefault(key, []).append((shapes, bool(r)))
            return r

        monkeypatch.setattr(mod, name, wrapper)
        return key

    expected_true = [
        spy(pallas_chain, "boundary_fits_rows"),   # HWNC stem+layer1 gate
        spy(pallas_chain, "block_fits"),           # whole-tail fused block
        spy(pallas_ae_conv, "hwnc_fits"),          # HWNC A+E 3x3s
        spy(pallas_fuse0, "fits"),                 # stage fuse-out0
        spy(pallas_fuse0, "fits_hwnc"),            # packed stage2->3 boundary
        # fused upsample+heads: since the r4 f4-x0 default the head
        # consumes stage-3 out-0 in its producer's f4 block form, so the
        # gate that must fire at bench shapes is fits_x0f4 (fits is the
        # NHWC fallback, only consulted when the f4 form doesn't apply)
        spy(pallas_upshead, "fits_x0f4"),
    ]

    h, w, batch = 512, 1024, 8
    cfg = Config(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="bfloat16",
        input_h=h, input_w=w, batch_size=batch, dataset="synthetic",
    )
    model = registry.build_model(cfg)
    key = jax.random.PRNGKey(0)

    def init_and_forward(rgb, seg):
        variables = model.init(key, rgb, seg, train=False)
        return model.apply(variables, rgb, seg, train=False)

    out = jax.eval_shape(
        init_and_forward,
        jax.ShapeDtypeStruct((batch, h, w, 6), jnp.bfloat16),
        jax.ShapeDtypeStruct((batch, h, w, 40), jnp.bfloat16),
    )
    assert out[0].shape == (batch, h, w, 3)
    assert out[1].shape == (batch, h, w, 20)

    for key_ in expected_true:
        recorded = calls.get(key_, [])
        assert recorded, f"{key_} was never consulted at bench shapes"
        bad = [shapes for shapes, ok in recorded if not ok]
        assert not bad, (
            f"{key_} returned False at bench shapes {bad} — a default-on "
            "Pallas fast path no longer engages on the benchmark model")
