"""Device mesh + sharding utilities.

The reference's distributed runtime is process-per-GPU DDP with NCCL
(reference main.py:76-77,152-154; runners/InterTrainer.py:63-64,84-87).
The TPU-native equivalent is a single-program ``jax.sharding.Mesh``:

- a 1-D ``data`` axis carries data parallelism (replaces DDP + the per-rank
  ``bs // num_gpus`` split of runners/InterTrainer.py:86);
- an optional ``spatial`` axis shards the H dimension of full-resolution
  1024x512 activations when per-chip HBM demands it;
- gradients/metrics are reduced with XLA collectives over ICI, which replaces
  both DDP's bucket all-reduce and the manual loss ``dist.all_reduce`` in
  ``InterTrainer.sync`` (runners/InterTrainer.py:859-864).

Multi-host runs call ``jax.distributed.initialize`` once (replacing the
TCP-port rendezvous in main.py:134-138) and then use the exact same code.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int
    spatial: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.spatial


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.

    The explicit DVIE_COORDINATOR/DVIE_NUM_PROCS/DVIE_PROC_ID contract is
    the TPU-native analog of the reference's NCCL TCP rendezvous
    (main.py:76-77, ``tcp://127.0.0.1:<port>``); without them,
    ``jax.distributed.initialize()`` falls back to its own cluster
    auto-detection (SLURM/GKE/TPU pods).  Exercised for real by
    tests/test_multihost.py on a 2-process gloo/CPU cluster.
    """
    if int(os.environ.get("DVIE_MULTIHOST", "0")):
        kw = {}
        if os.environ.get("DVIE_COORDINATOR"):
            nproc = os.environ.get("DVIE_NUM_PROCS")
            pid = os.environ.get("DVIE_PROC_ID")
            if nproc is None or pid is None:
                raise RuntimeError(
                    "DVIE_COORDINATOR is set but the rendezvous contract "
                    "needs all three variables: DVIE_COORDINATOR=<host:port>"
                    ", DVIE_NUM_PROCS=<N>, DVIE_PROC_ID=<0..N-1> "
                    f"(got DVIE_NUM_PROCS={nproc!r}, DVIE_PROC_ID={pid!r})")
            if not 0 <= int(pid) < int(nproc):
                raise RuntimeError(
                    f"DVIE_PROC_ID={pid} out of range for "
                    f"DVIE_NUM_PROCS={nproc}")
            kw = dict(
                coordinator_address=os.environ["DVIE_COORDINATOR"],
                num_processes=int(nproc),
                process_id=int(pid),
            )
        jax.distributed.initialize(**kw)


def create_mesh(
    num_data: int = 0,
    num_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices.

    ``num_data=0`` means "all remaining devices on the data axis".  Axis
    order puts ``spatial`` innermost so spatial collectives ride the
    fastest ICI links.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if num_data <= 0:
        assert len(devs) % num_spatial == 0, (len(devs), num_spatial)
        num_data = len(devs) // num_spatial
    need = num_data * num_spatial
    assert need <= len(devs), f"mesh {num_data}x{num_spatial} needs {need} devices, have {len(devs)}"
    grid = np.asarray(devs[:need]).reshape(num_data, num_spatial)
    return Mesh(grid, axis_names=(DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over data; optionally shard ``spatial_dim`` over spatial."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if spatial_dim is not None and mesh.shape[SPATIAL_AXIS] > 1:
        spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch, mirroring ``bs // num_gpus`` (InterTrainer.py:86)."""
    n = mesh.shape[DATA_AXIS]
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
