"""Serving export: StableHLO roundtrip through jax.export.

The artifact is self-contained (params baked in); loading it needs no
model code or checkpoint and reproduces the live forward exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.tools import export as export_lib

H, W, B = 32, 64, 2


def _cfg(**kw):
    base = dict(
        runner="INTER", model="InterNet", syn_type="inter", mode="xs2xs",
        train_coarse=True, coarse_model="HRNet", compute_dtype="float32",
        input_h=H, input_w=W, batch_size=B, dataset="synthetic",
    )
    base.update(kw)
    return Config(**base)


def test_export_roundtrip(tmp_path):
    cfg = _cfg()
    model = registry.build_model(cfg)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    seg = jnp.asarray(
        np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, H, W, 2))]
        .reshape(B, H, W, 40))
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)

    path = export_lib.export_forward(
        cfg, variables, str(tmp_path / "internet.stablehlo"), model=model)
    assert os.path.getsize(path) > 0

    served = export_lib.load_exported(path)
    out_rgb, out_seg = served(rgb, seg)
    ref_rgb, ref_seg = model.apply(variables, rgb, seg, train=False)
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_seg), np.asarray(ref_seg),
                               atol=1e-6, rtol=1e-6)


def test_export_multiplatform_artifact(tmp_path):
    """Exporting with platforms=('cpu','tpu') produces one artifact that
    the current (CPU) backend can serve; the TPU lowering rides along."""
    cfg = _cfg()
    model = registry.build_model(cfg)
    rgb = jnp.zeros((B, H, W, 6), jnp.float32)
    seg = jnp.zeros((B, H, W, 40), jnp.float32)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)
    path = export_lib.export_forward(
        cfg, variables, str(tmp_path / "internet_multi.stablehlo"),
        model=model, platforms=("cpu", "tpu"))
    served = export_lib.load_exported(path)
    out_rgb, _ = served(rgb, seg)
    assert np.all(np.isfinite(np.asarray(out_rgb)))


def test_export_vae_generator(tmp_path):
    """VAE generators (the GAN recipe's coarse model) sample prior z at
    eval from the 'noise' rng; their export takes a leading int32 seed
    input and reproduces the live forward for the same seed.  This used
    to crash with an unfulfilled-rng error."""
    cfg = _cfg(coarse_model="VAEHRNet", vae=True)
    model = registry.build_model(cfg)
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    seg = jnp.asarray(
        np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, H, W, 2))]
        .reshape(B, H, W, 40))
    variables = jax.jit(model.init, static_argnames=["train"])(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        rgb, seg, train=False)

    path = export_lib.export_forward(
        cfg, variables, str(tmp_path / "vaehrnet.stablehlo"), model=model)
    served = export_lib.load_exported(path)
    seed = jnp.int32(42)
    out_rgb, out_seg = served(seed, rgb, seg)
    ref_rgb, ref_seg = model.apply(
        variables, rgb, seg, train=False,
        rngs={"noise": jax.random.PRNGKey(seed)})
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_seg), np.asarray(ref_seg),
                               atol=1e-6, rtol=1e-6)
    # a different seed draws a different prior z
    out2_rgb, _ = served(jnp.int32(7), rgb, seg)
    assert not np.allclose(np.asarray(out2_rgb), np.asarray(out_rgb))


def test_export_extranet(tmp_path):
    """The extrapolation head exports with the same API; its output pair is
    (rgb rollout chunk, seg logits)."""
    cfg = _cfg(runner="EXTRA", model="ExtraNet", syn_type="extra")
    model = registry.build_model(cfg)
    rgb = jnp.zeros((B, H, W, 6), jnp.float32)
    seg = jnp.zeros((B, H, W, 40), jnp.float32)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=False)
    path = export_lib.export_forward(
        cfg, variables, str(tmp_path / "extranet.stablehlo"), model=model)
    served = export_lib.load_exported(path)
    out_rgb, out_seg = served(rgb, seg)
    ref_rgb, ref_seg = model.apply(variables, rgb, seg, train=False)[:2]
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_seg), np.asarray(ref_seg),
                               atol=1e-6, rtol=1e-6)


def test_servebench_tool_smoke():
    """tools_servebench.py end-to-end at tiny shapes: export -> reload
    with no model code -> the feedback rollout produces one JSON line
    (the serving-latency measurement contract, docs/ABLOG_r3.md)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools_servebench.py"),
         "--mode", "throughput", "--bs", "1", "--hw", "16,32",
         "--iters", "2"],
        capture_output=True, text=True, timeout=900, cwd=repo)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["metric"] == "serving_artifact_interp_fps"
    assert out["value"] > 0 and out["artifact_mb"] > 0


def test_export_rollout_artifact(tmp_path):
    """export_rollout: the whole N-frame cycgen window (argmax->one-hot
    feedback scan, reference mini_test InterTrainer.py:786-856) as ONE
    artifact; loading reproduces the step-by-step live composition."""
    cfg = _cfg()
    model = registry.build_model(cfg)
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 6)), jnp.float32)
    seg_ids = jnp.asarray(rng.randint(0, 20, (B, H, W)), jnp.uint8)
    seg0 = jnp.concatenate([jax.nn.one_hot(seg_ids, 20)] * 2, axis=-1)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg0, train=False)

    steps = 3
    path = export_lib.export_rollout(
        cfg, variables, str(tmp_path / "roll.stablehlo"), steps=steps,
        model=model)
    served = export_lib.load_exported(path)
    frames, ids = served(rgb, seg_ids)
    assert frames.shape == (steps, B, H, W, 3)
    assert ids.shape == (steps, B, H, W) and ids.dtype == jnp.uint8

    # live composition oracle
    cur_rgb, cur_ids = rgb, seg_ids
    for t in range(steps):
        oh = jax.nn.one_hot(cur_ids, 20, dtype=cur_rgb.dtype)
        cur_seg = jnp.concatenate([oh, oh], axis=-1)
        out_rgb, out_seg = model.apply(variables, cur_rgb, cur_seg,
                                       train=False)
        nxt_ids = jnp.argmax(out_seg, -1).astype(jnp.uint8)
        np.testing.assert_allclose(np.asarray(frames[t]),
                                   np.asarray(out_rgb),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ids[t]),
                                      np.asarray(nxt_ids))
        cur_rgb = jnp.concatenate([out_rgb, out_rgb],
                                  axis=-1).astype(cur_rgb.dtype)
        cur_ids = nxt_ids
