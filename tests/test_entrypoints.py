"""Driver-contract tests: ``__graft_entry__.entry`` compiles and runs, and
``dryrun_multichip`` executes the full sharded HRNet train step on the
8-device CPU mesh.  These are the only tests exercising the real HRNet
(everything else uses tiny models); the persistent compile cache makes
repeat runs fast.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as graft  # noqa: E402


def test_entry_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    rgb, seg = out
    assert rgb.shape == (2, 64, 128, 3)
    assert seg.shape == (2, 64, 128, 20)
    assert np.all(np.isfinite(np.asarray(rgb, dtype=np.float32)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_poisoned_default_backend(monkeypatch):
    """Regression for MULTICHIP_r01 (rc=1): the driver env's default TPU
    backend raised on every dispatch.  Simulate a broken default backend —
    ``jax.devices()`` with no argument raises — and require the dryrun to
    fall back to the CPU client without ever consulting the default."""
    real_devices = jax.devices

    def poisoned(backend=None):
        if backend is None:
            raise RuntimeError("libtpu version mismatch (poisoned)")
        return real_devices(backend)

    monkeypatch.setattr(jax, "devices", poisoned)
    graft.dryrun_multichip(4)


def test_dryrun_device_resolution_probes_default():
    """A default backend that lists devices but fails on dispatch (the
    exact r01 failure mode) must also fall back to the CPU client."""

    class _FailingDevice:
        platform = "tpu"

        def __repr__(self):
            return "PoisonedTpuDevice()"

    import unittest.mock as mock

    fake = [_FailingDevice() for _ in range(8)]
    real_devices = jax.devices

    def listed_but_broken(backend=None):
        if backend is None:
            return fake  # device_put onto these raises below
        return real_devices(backend)

    with mock.patch.object(jax, "devices", listed_but_broken):
        devs = graft._resolve_dryrun_devices(4)
    assert all(d.platform == "cpu" for d in devs)


def test_dryrun_device_resolution_survives_hung_default(monkeypatch):
    """A wedged relay-backed plugin can HANG (not raise) on first use
    (observed 2026-08-18: backend init blocked for hours).  The probe runs
    under a watchdog thread; on timeout the dryrun must fall back to the
    CPU client."""
    import time

    real_devices = jax.devices

    def hanging(backend=None):
        if backend is None:
            time.sleep(3600)
        return real_devices(backend)

    monkeypatch.setattr(graft, "_PROBE_TIMEOUT", 2.0)
    monkeypatch.setattr(jax, "devices", hanging)
    devs = graft._resolve_dryrun_devices(4)
    assert all(d.platform == "cpu" for d in devs)


def test_dryrun_pins_platform_before_discovery():
    """In a fresh process with the driver's virtual-CPU signature
    (xla_force_host_platform_device_count) and no JAX_PLATFORMS, the
    dryrun must restrict backend discovery to CPU BEFORE any jax call —
    a hung TPU plugin init is uncatchable after the fact."""
    import os
    import subprocess
    import sys as _sys

    code = (
        "import os, sys\n"
        "sys.path.insert(0, '.')\n"
        "import __graft_entry__ as graft\n"
        "devs = graft._resolve_dryrun_devices(8)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "assert len(devs) == 8 and all(d.platform == 'cpu' for d in devs)\n"
        "# the pin is dropped after discovery so children don't inherit it\n"
        "assert 'JAX_PLATFORMS' not in os.environ\n"
        "print('PIN_OK')\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "PALLAS_AXON_POOL_IPS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    res = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PIN_OK" in res.stdout


def test_dryrun_resolution_overrides_broken_platform_pin():
    """The ambient env can pin JAX_PLATFORMS to a platform that is broken
    or absent (observed live: JAX_PLATFORMS=axon with the relay down wedges
    backend init inside jax's process-wide lock, deadlocking even the CPU
    fallback).  In a fresh process the dryrun must detect this WITHOUT
    initializing the broken platform in-process (bounded subprocess probe),
    then force CPU discovery with a self-provided virtual device count —
    and restore the env afterwards."""
    import os
    import subprocess
    import sys as _sys

    code = (
        "import os, sys\n"
        "sys.path.insert(0, '.')\n"
        "import __graft_entry__ as graft\n"
        "devs = graft._resolve_dryrun_devices(8)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "assert len(devs) == 8 and all(d.platform == 'cpu' for d in devs)\n"
        "# env untouched: the broken pin stays the caller's to pass on\n"
        "assert os.environ.get('JAX_PLATFORMS') == 'axon'\n"
        "assert 'XLA_FLAGS' not in os.environ\n"
        "# ...but in-process jax must stay usable (config kept at cpu —\n"
        "# restoring the broken pin would poison every later\n"
        "# get_backend(None) lookup)\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.zeros(()) + 1) == 1.0\n"
        "print('OVERRIDE_OK')\n"
    )
    # axon is pinned but its plugin is NOT registered (no
    # PALLAS_AXON_POOL_IPS): discovery of it raises -> the subprocess
    # probe fails fast -> CPU override must engage
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORM_NAME", "PALLAS_AXON_POOL_IPS",
                        "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "axon"
    res = subprocess.run([_sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OVERRIDE_OK" in res.stdout


def test_dryrun_with_tpu_default_backend_simulated(monkeypatch):
    """The driver's real multichip environment keeps a TPU plugin as the
    DEFAULT backend while the dryrun places everything on the CPU client.
    The model's Pallas gates used to key on jax.default_backend() and
    compiled Pallas calls for the CPU devices ('Only interpret mode is
    supported on CPU backend').  dryrun_multichip must run with the
    default backend reporting 'tpu' (it sets DVIE_PALLAS=0 + spatial
    sharding flags so every fast path takes its XLA composition)."""
    monkeypatch.delenv("DVIE_PALLAS", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    graft.dryrun_multichip(4)
