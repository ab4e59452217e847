"""REAL multi-process (multi-host) data parallelism on a gloo/CPU cluster.

The reference's distributed runtime is one NCCL process per GPU with a
TCP rendezvous (main.py:76-77, 152-154).  The TPU-native equivalent is
``jax.distributed.initialize`` + a global mesh; this test launches TWO
actual processes (2 local CPU devices each -> 4 global), drives them
through the framework's own ``maybe_init_distributed`` env contract
(DVIE_MULTIHOST/DVIE_COORDINATOR), runs one InterNet train step on a
globally-sharded batch, and asserts the loss matches a single-process
4-device run of the identical step (the multi-host DDP-equivalence
claim).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np

from deep_video_interpolation_extrapolation_tpu.parallel.mesh import (
    DATA_AXIS, create_mesh, maybe_init_distributed,
)

maybe_init_distributed()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models import registry
from deep_video_interpolation_extrapolation_tpu.train import (
    inter, state as state_lib,
)

assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

h, w, b = 32, 64, 4
cfg = Config(runner="INTER", model="InterNet", syn_type="inter",
             mode="xs2xs", train_coarse=True, coarse_model="HRNet",
             compute_dtype="float32", input_h=h, input_w=w, batch_size=b,
             dataset="synthetic", num_data_shards=4)
model = registry.build_model(cfg)
rgb = jnp.zeros((b, h, w, 6), jnp.float32)
seg = jnp.zeros((b, h, w, 40), jnp.float32)
variables = jax.jit(model.init, static_argnames=["train"])(
    jax.random.PRNGKey(0), rgb, seg, train=True)
state = state_lib.create_train_state(cfg, variables, frozen={})

mesh = create_mesh(4, 1)
rng = np.random.RandomState(3)
batch_np = {
    "frame1": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
    "frame2": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
    "frame3": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
    "seg1": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
    "seg2": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
    "seg3": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
}
def put(v):
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_callback(v.shape, sh, lambda idx: v[idx])
batch = {k: put(v) for k, v in batch_np.items()}
# replicated global state from identical per-process host values
state = jax.device_put(state, NamedSharding(mesh, P()))

step = jax.jit(inter.make_train_step(cfg, model))
new_state, losses = step(state, batch, jax.random.PRNGKey(1))
print("MH_LOSS", float(losses["loss_all"]), flush=True)
"""


def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "DVIE_MULTIHOST": "1",
        "DVIE_COORDINATOR": f"127.0.0.1:{port}",
        "DVIE_NUM_PROCS": "2",
        "DVIE_PALLAS": "0",
    }
    env_base.pop("PALLAS_AXON_POOL_IPS", None)  # skip the TPU relay boot

    procs = []
    for pid in range(2):
        env = {**env_base, "DVIE_PROC_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=840)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("MH_LOSS")]
        assert line, out[-2000:]
        losses.append(float(line[-1].split()[1]))
    assert np.isfinite(losses[0])
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process 4-device reference for the same step
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.models import registry
    from deep_video_interpolation_extrapolation_tpu.parallel.mesh import (
        DATA_AXIS,
        create_mesh,
    )
    from deep_video_interpolation_extrapolation_tpu.train import (
        inter,
        state as state_lib,
    )

    h, w, b = 32, 64, 4
    cfg = Config(runner="INTER", model="InterNet", syn_type="inter",
                 mode="xs2xs", train_coarse=True, coarse_model="HRNet",
                 compute_dtype="float32", input_h=h, input_w=w,
                 batch_size=b, dataset="synthetic", num_data_shards=4)
    model = registry.build_model(cfg)
    rgb = jnp.zeros((b, h, w, 6), jnp.float32)
    seg = jnp.zeros((b, h, w, 40), jnp.float32)
    variables = jax.jit(model.init, static_argnames=["train"])(
        jax.random.PRNGKey(0), rgb, seg, train=True)
    state = state_lib.create_train_state(cfg, variables, frozen={})

    mesh = create_mesh(4, 1, devices=jax.devices()[:4])
    rng = np.random.RandomState(3)
    batch_np = {
        "frame1": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "frame2": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "frame3": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "seg1": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
        "seg2": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
        "seg3": np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))],
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P(DATA_AXIS)))
             for k, v in batch_np.items()}
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = jax.jit(inter.make_train_step(cfg, model))
    _, losses1 = step(state, batch, jax.random.PRNGKey(1))
    assert losses[0] == pytest.approx(float(losses1["loss_all"]), rel=2e-5)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
