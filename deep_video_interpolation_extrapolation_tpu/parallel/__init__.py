from deep_video_interpolation_extrapolation_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    create_mesh,
    replicated_sharding,
    local_batch_size,
)
