from deep_video_interpolation_extrapolation_tpu.data.synthetic import (  # noqa: F401
    synthetic_batch,
    SyntheticClipDataset,
)
from deep_video_interpolation_extrapolation_tpu.data.datasets import (  # noqa: F401
    get_dataset,
)
