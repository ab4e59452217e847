from deep_video_interpolation_extrapolation_tpu.core.config import Config  # noqa: F401
