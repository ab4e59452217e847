from deep_video_interpolation_extrapolation_tpu.ops.resize import (  # noqa: F401
    interpolate_bilinear,
    interpolate_nearest,
    avg_pool,
    max_pool,
)
from deep_video_interpolation_extrapolation_tpu.ops.warp import (  # noqa: F401
    backward_warp,
    flow_warp,
    make_base_grid,
)
from deep_video_interpolation_extrapolation_tpu.ops.corr import (  # noqa: F401
    window_correlation,
    window_aggregate,
)
from deep_video_interpolation_extrapolation_tpu.ops.roi import (  # noqa: F401
    crop_resize,
    paste_patches,
)
