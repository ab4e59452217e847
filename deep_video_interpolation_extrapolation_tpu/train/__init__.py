from deep_video_interpolation_extrapolation_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    submodel_specs,
)
