from deep_video_interpolation_extrapolation_tpu.losses.image import (  # noqa: F401
    ssim,
    ssim_loss,
    psnr,
    iou_accuracy,
    gdl_loss,
    l1_loss,
    cross_entropy_loss,
    sharpness_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.vae import kld_loss  # noqa: F401
from deep_video_interpolation_extrapolation_tpu.losses.gan import (  # noqa: F401
    hinge_d_loss,
    hinge_g_loss,
    gan_scalar_loss,
    bce_gan_loss,
    gan_map_loss,
)
from deep_video_interpolation_extrapolation_tpu.losses.bundles import (  # noqa: F401
    rgb_loss_bundle,
)
