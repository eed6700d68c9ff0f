"""
Test-only torch implementation of EfficientNetV2, mirroring the torchvision
module layout (conv->BN pairs in construction order, SE convs with biases,
final linear) so the ordered-consumption converter is exercised exactly as
it would be on real torchvision checkpoints.
"""

import numpy as np
import torch
import torch.nn as nn

from megadetector_tpu.models.efficientnet import EFFICIENTNET_V2_CONFIGS


class ConvBNAct(nn.Module):

    def __init__(self, c_in, c_out, k, s, groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, k, s, k // 2, groups=groups,
                              bias=False)
        self.bn = nn.BatchNorm2d(c_out, eps=1e-3)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class SqueezeExcite(nn.Module):

    def __init__(self, c_exp, c_se):
        super().__init__()
        self.fc1 = nn.Conv2d(c_exp, c_se, 1)
        self.fc2 = nn.Conv2d(c_se, c_exp, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.fc1(s))
        s = torch.sigmoid(self.fc2(s))
        return x * s


class FusedMBConv(nn.Module):

    def __init__(self, c_in, c_out, expansion, k, s):
        super().__init__()
        self.use_residual = (s == 1 and c_in == c_out)
        c_exp = c_in * expansion
        if expansion == 1:
            self.block = nn.Sequential(ConvBNAct(c_in, c_out, k, s))
        else:
            self.block = nn.Sequential(
                ConvBNAct(c_in, c_exp, k, s),
                ConvBNAct(c_exp, c_out, 1, 1, act=False))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_residual else y


class MBConv(nn.Module):

    def __init__(self, c_in, c_out, expansion, k, s):
        super().__init__()
        self.use_residual = (s == 1 and c_in == c_out)
        c_exp = c_in * expansion
        c_se = max(1, c_in // 4)
        self.block = nn.Sequential(
            ConvBNAct(c_in, c_exp, 1, 1),
            ConvBNAct(c_exp, c_exp, k, s, groups=c_exp),
            SqueezeExcite(c_exp, c_se),
            ConvBNAct(c_exp, c_out, 1, 1, act=False))

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_residual else y


class TorchEfficientNetV2(nn.Module):

    def __init__(self, arch='efficientnetv2_s', num_classes=10):
        super().__init__()
        cfg = EFFICIENTNET_V2_CONFIGS[arch]
        layers = [ConvBNAct(3, cfg['stem_channels'], 3, 2)]
        c_in = cfg['stem_channels']
        for (block, expansion, k, stride, c_out, n_layers) in cfg['stages']:
            for i in range(n_layers):
                s = stride if i == 0 else 1
                cls = FusedMBConv if block == 'fused' else MBConv
                layers.append(cls(c_in, c_out, expansion, k, s))
                c_in = c_out
        layers.append(ConvBNAct(c_in, cfg['head_channels'], 1, 1))
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Linear(cfg['head_channels'], num_classes)

    def forward(self, x):
        x = self.features(x)
        x = x.mean((2, 3))
        return self.classifier(x)


def make_torch_effnet(arch='efficientnetv2_s', num_classes=10, seed=0):
    torch.manual_seed(seed)
    model = TorchEfficientNetV2(arch, num_classes)
    rng = np.random.RandomState(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.tensor(
                rng.uniform(-0.5, 0.5, n), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, n), dtype=torch.float32))
    model.eval()
    return model
