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
from deep_video_interpolation_extrapolation_tpu.models.detdisc import (  # noqa: F401
    FrameDetDiscriminator,
    FrameSNDetDiscriminator,
    FrameLSSNDetDiscriminator,
    VideoDetDiscriminator as VideoDetDisc,
    VideoSNDetDiscriminator,
    VideoLSSNDetDiscriminator,
    VideoVecSNDetDiscriminator,
    VideoPoolSNDetDiscriminator,
    VideoGlobalZeroSNDetDiscriminator,
    VideoGlobalMaskSNDetDiscriminator,
    VideoGlobalCoordSNDetDiscriminator,
    VideoGlobalResSNDetDiscriminator,
    VideoLocalPatchSNDetDiscriminator,
)
from deep_video_interpolation_extrapolation_tpu.models.legacy_gen import (  # noqa: F401
    MyFRRN,
    PSPNet,
    PSPNetV2,
    B2SNet,
    FRRU,
)
from deep_video_interpolation_extrapolation_tpu.models.gridnet import (  # noqa: F401
    GridNet,
)
from deep_video_interpolation_extrapolation_tpu.models.legacy_disc import (  # noqa: F401
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    MotionDiscriminator,
)
from deep_video_interpolation_extrapolation_tpu.models.vae_video import (  # noqa: F401
    VAE,
    VAE_S,
    VAE_SD,
    VideoVAE,
)
from deep_video_interpolation_extrapolation_tpu.models.legacy_heads import (  # noqa: F401
    GAN,
    RefineNet,
    RefineGAN,
)
from deep_video_interpolation_extrapolation_tpu.models.subnets import (  # noqa: F401
    SegEncoderBN,
    FlowEncoder,
    FrameEncoder,
    FlowDecoder,
    GateConv3d,
    GetFlow,
    GetFrames,
    GetOcclusionMask,
    LegacyEncoder,
    LegacyDecoder,
    LegacyRefineNet,
    Flow2FrameWarped,
)
from deep_video_interpolation_extrapolation_tpu.models.srn_legacy import (  # noqa: F401
    SRN4,
    SRN4Seg,
    SRN4Sharp,
    HResUnet,
    AttnRefine,
    AttnBaseRefine,
    MSConv2d,
    MSResnetBlock,
    MSBaseRefine,
)
from deep_video_interpolation_extrapolation_tpu.models.attn_legacy import (  # noqa: F401
    AttnRefineV2,
    AttnRefineV2O,
    AttnRefineV2Base,
    AttnRefineV3,
    AttnRefineV3Base,
    AttnRefineV4,
    AttnRefineV4Base,
)
from deep_video_interpolation_extrapolation_tpu.models.registry import (  # noqa: F401
    build_model,
)
