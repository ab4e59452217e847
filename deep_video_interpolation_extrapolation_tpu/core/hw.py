"""Hardware gating for the Pallas fast paths.

Every Pallas route checks :func:`pallas_enabled` IN ADDITION to its own
shape/sharding conditions.  ``jax.default_backend() == "tpu"`` alone is
the wrong signal when computations are explicitly placed on another
client: the driver's multichip dryrun builds a CPU mesh while a TPU
plugin is still the default backend, and a Pallas call compiled for those
CPU devices aborts with "Only interpret mode is supported on CPU
backend".  ``DVIE_PALLAS=0`` is the kill-switch such runs set (the dryrun
sets it itself); it also gives users a one-flag way to A/B the pure-XLA
compositions.
"""

from __future__ import annotations

import os

import jax


def pallas_enabled() -> bool:
    return (jax.default_backend() == "tpu"
            and os.environ.get("DVIE_PALLAS", "1") != "0")
