"""Model zoo — Flax/NHWC re-implementations of the reference ``nets/`` package."""

from deep_video_interpolation_extrapolation_tpu.models.hrnet import (  # noqa: F401
    HRNet,
    VAEHRNet,
    InpaintUnet,
)
from deep_video_interpolation_extrapolation_tpu.models.unet import (  # noqa: F401
    UNet,
    SepUNet,
)
from deep_video_interpolation_extrapolation_tpu.models.refine import SRNRefine  # noqa: F401
from deep_video_interpolation_extrapolation_tpu.models.attn_refine import (  # noqa: F401
    MSResAttnRefine,
    MSResAttnRefineV2,
    MSResAttnRefineV2Base,
    MSResAttnRefineV3,
)
from deep_video_interpolation_extrapolation_tpu.models.trackgen import (  # noqa: F401
    TrackGen,
    TrackGenV2,
)
from deep_video_interpolation_extrapolation_tpu.models.discriminators import (  # noqa: F401
    FrameDiscriminator,
    FrameLocalDiscriminator,
    FrameSNDiscriminator,
    FrameSNLocalDiscriminator,
    VideoDiscriminator,
    VideoLocalDiscriminator,
    VideoSNDiscriminator,
    VideoSNLocalDiscriminator,
)
from deep_video_interpolation_extrapolation_tpu.models.optical import (  # noqa: F401
    OpticalUnet,
    OpticalRefineNet,
    RefineUnet,
)
from deep_video_interpolation_extrapolation_tpu.models.composite import (  # noqa: F401
    InterNet,
    InterRefineNet,
    InterStage3Net,
    InterGANNet,
    ExtraNet,
    ExtraInpaintNet,
)
from deep_video_interpolation_extrapolation_tpu.models.features import (  # noqa: F401
    VGG19Features,
    ResNet101Features,
)
from deep_video_interpolation_extrapolation_tpu.models.registry import (  # noqa: F401
    build_model,
)
