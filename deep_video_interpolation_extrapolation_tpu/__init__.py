"""TPU-native joint long-interval video interpolation & extrapolation framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of the reference
PyTorch project ``lzhangbj/deep_video_interpolation_extrapolation`` (mounted at
/root/reference), re-designed TPU-first:

- NHWC layouts everywhere (TPU-native convolution layout).
- All compute paths are pure functions compiled under ``jax.jit``/``shard_map``.
- Data parallelism over a ``jax.sharding.Mesh`` (``parallel/``), gradients
  reduced over ICI with ``psum`` instead of DDP buckets
  (reference: main.py:76-77, runners/InterTrainer.py:63-64).
- Hot gather ops (flow backward-warp, windowed patch-correlation attention)
  have Pallas TPU kernels with XLA-native fallbacks (``ops/``).
- The reference CLI flag surface (options/options.py) is preserved in
  ``cli/main.py``; internally flags map to typed dataclass configs.
"""

__version__ = "0.1.0"

from deep_video_interpolation_extrapolation_tpu.core.config import (  # noqa: F401
    Config,
)
