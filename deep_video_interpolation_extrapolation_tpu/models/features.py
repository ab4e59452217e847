"""Frozen perceptual feature extractors (VGG19, ResNet101).

Reference equivalents: ``my_vgg`` (nets/vgg.py:5-55) — VGG19 features with
*average* pooling, returning relu1_2/relu2_2/relu3_4/relu4_4/relu5_4 — and
``my_resnet101`` (nets/resnet101.py:5-21) returning layer2/3/4 features.

The reference loads torchvision ImageNet weights.  This environment has no
torchvision/weights, so the extractors initialize randomly unless a
converted checkpoint is supplied via ``load_torch_vgg19_state`` /
``load_torch_resnet101_state`` (which map a torch ``state_dict`` —
OIHW conv kernels — into these modules' NHWC/HWIO params).  Random-init VGG
features are still a meaningful perceptual signal (random-projection
literature), but absolute VGG-loss values will differ from the reference
until real weights are provided; L1/PSNR/SSIM/IoU parity is unaffected.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VGG19_PLAN: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256, 256),
    (512, 512, 512, 512), (512, 512, 512, 512),
)


def imagenet_norm(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized (utils/net_utils.py:11-23)."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class VGG19Features(nn.Module):
    """VGG19 feature pyramid with avg-pool downsampling (nets/vgg.py:5-55).

    Input: ImageNet-normalized NHWC.  Returns 5 feature maps
    (relu1_2, relu2_2, relu3_4, relu4_4, relu5_4).
    """
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        for bi, block in enumerate(VGG19_PLAN):
            if bi > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            for ci, ch in enumerate(block):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            feats.append(x)
        return feats


class _RNBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        out_ch = self.planes * 4
        residual = x
        h = nn.relu(bn(nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)))
        h = nn.relu(bn(nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                               padding=((1, 1), (1, 1)), use_bias=False,
                               dtype=self.dtype)(h)))
        h = bn(nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h))
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = bn(nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                                  use_bias=False, dtype=self.dtype)(x))
        return nn.relu(h + residual)


class ResNet101Features(nn.Module):
    """ResNet101 stages 2-4 features (nets/resnet101.py:5-21)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages = []
        for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2)):
            for b in range(blocks):
                h = _RNBottleneck(planes, stride if b == 0 else 1,
                                  dtype=self.dtype)(h, train=train)
            stages.append(h)
        return stages[1], stages[2], stages[3]


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_resnet101_state(variables: Dict,
                               state_dict: Dict[str, np.ndarray]) -> Dict:
    """Map torchvision resnet101 weights into ResNet101Features variables.

    ``variables`` is the full ``{params, batch_stats}`` dict from
    ``ResNet101Features().init``; ``state_dict`` uses torchvision's keys
    (``conv1/bn1``, ``layer{1..4}.{b}.conv{1..3}/bn{1..3}``, block-0
    ``downsample.0/1``).  Conv kernels transpose OIHW -> HWIO; BN
    running_mean/var land in ``batch_stats``.  fc.* keys are ignored
    (the reference takes features only, nets/resnet101.py:5-21).
    """
    import jax
    new = jax.tree_util.tree_map(lambda x: x, variables)
    params, stats = new["params"], new["batch_stats"]

    def put_conv(node, tkey):
        node["kernel"] = jnp.asarray(
            _oihw_to_hwio(np.asarray(state_dict[tkey + ".weight"])))

    def put_bn(pnode, snode, tkey):
        pnode["scale"] = jnp.asarray(np.asarray(state_dict[tkey + ".weight"]))
        pnode["bias"] = jnp.asarray(np.asarray(state_dict[tkey + ".bias"]))
        snode["mean"] = jnp.asarray(
            np.asarray(state_dict[tkey + ".running_mean"]))
        snode["var"] = jnp.asarray(
            np.asarray(state_dict[tkey + ".running_var"]))

    put_conv(params["Conv_0"], "conv1")
    put_bn(params["BatchNorm_0"], stats["BatchNorm_0"], "bn1")
    bi = 0
    for layer, blocks in (("layer1", 3), ("layer2", 4),
                          ("layer3", 23), ("layer4", 3)):
        for b in range(blocks):
            name, t = f"_RNBottleneck_{bi}", f"{layer}.{b}"
            bp, bs = params[name], stats[name]
            for c in range(3):
                put_conv(bp[f"Conv_{c}"], f"{t}.conv{c + 1}")
                put_bn(bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"],
                       f"{t}.bn{c + 1}")
            if "Conv_3" in bp:  # block 0 of each stage
                put_conv(bp["Conv_3"], f"{t}.downsample.0")
                put_bn(bp["BatchNorm_3"], bs["BatchNorm_3"],
                       f"{t}.downsample.1")
            bi += 1
    return new


def load_torch_vgg19_state(params: Dict, state_dict: Dict[str, np.ndarray]) -> Dict:
    """Map torchvision vgg19 ``features.*`` weights into VGG19Features params."""
    import jax
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    names = [f"conv{b + 1}_{c + 1}" for b, blk in enumerate(VGG19_PLAN) for c in range(len(blk))]
    new = jax.tree_util.tree_map(lambda x: x, params)
    p = new["params"] if "params" in new else new
    for name, tid in zip(names, conv_ids):
        p[name]["kernel"] = jnp.asarray(_oihw_to_hwio(np.asarray(state_dict[f"features.{tid}.weight"])))
        p[name]["bias"] = jnp.asarray(np.asarray(state_dict[f"features.{tid}.bias"]))
    return new
