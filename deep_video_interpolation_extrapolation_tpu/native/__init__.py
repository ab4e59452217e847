"""Native (C++) host-side runtime components.

``host`` — libpng-backed fused decode/flip/crop/normalize/one-hot for the
input pipeline (the analog of the reference's C++-backed
``torch.utils.data.DataLoader`` worker path, runners/InterTrainer.py:84-87),
lazily compiled with the system toolchain and bound via ctypes.
"""

from deep_video_interpolation_extrapolation_tpu.native import host  # noqa: F401
