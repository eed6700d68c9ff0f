"""
Test-only torch implementation of the YOLOv5 architecture, built from the
same config table as the JAX model. Used to verify (a) that the JAX network
reproduces torch conv/SiLU/SPPF/upsample/decode numerics, and (b) that the
weight converter (state-dict key mapping + BatchNorm fusion) is correct —
this torch model produces state dicts with the exact key layout of real
YOLOv5 checkpoints ('model.0.conv.weight', 'model.24.m.0.weight', ...).

This file is test infrastructure, NOT part of the serving path (the
framework never imports torch at inference time).
"""

import numpy as np
import torch
import torch.nn as nn


class Conv(nn.Module):
    """conv + BN + SiLU, matching YOLOv5's Conv block (BN eps=1e-3)."""

    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2 if p is None else p,
                              bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):

    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1, 1)
        self.cv2 = Conv(c2, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3(nn.Module):

    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = int(c2 * 0.5)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class SPPF(nn.Module):

    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        y3 = self.m(y2)
        return self.cv2(torch.cat((x, y1, y2, y3), 1))


class Concat(nn.Module):

    def forward(self, xs):
        return torch.cat(xs, 1)


class Detect(nn.Module):
    """Anchor-based YOLOv5 detect head with v6-style decode."""

    def __init__(self, nc, anchors, strides, ch):
        super().__init__()
        self.nc = nc
        self.no = nc + 5
        self.nl = len(anchors)
        self.na = len(anchors[0])
        # Stored grid-relative like real checkpoints (pixels / stride)
        a = torch.tensor(anchors, dtype=torch.float32)
        strides_t = torch.tensor(strides, dtype=torch.float32)
        self.register_buffer('anchors', a / strides_t.view(-1, 1, 1))
        self.strides = strides
        self.m = nn.ModuleList(
            nn.Conv2d(c, self.no * self.na, 1) for c in ch)

    def forward(self, xs):
        outs = []
        for i, x in enumerate(xs):
            x = self.m[i](x)
            bs, _, ny, nx = x.shape
            x = x.view(bs, self.na, self.no, ny, nx) \
                .permute(0, 1, 3, 4, 2).contiguous()
            y = x.sigmoid()
            yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                                    indexing='ij')
            grid = torch.stack((xv, yv), 2).float().view(1, 1, ny, nx, 2)
            stride = self.strides[i]
            anchor = (self.anchors[i] * stride).view(1, self.na, 1, 1, 2)
            xy = (y[..., 0:2] * 2 - 0.5 + grid) * stride
            wh = (y[..., 2:4] * 2) ** 2 * anchor
            out = torch.cat((xy, wh, y[..., 4:]), -1)
            outs.append(out.view(bs, -1, self.no))
        return torch.cat(outs, 1)


class TorchYolo(nn.Module):
    """
    Graph executor over a YoloV5Config from the JAX side, with submodule
    names matching real YOLOv5 checkpoints.
    """

    def __init__(self, config):
        super().__init__()
        self.config = config
        modules = []
        for entry in config.layers:
            kind = entry['kind']
            if kind == 'conv':
                modules.append(Conv(entry['c_in'], entry['c_out'],
                                    entry['k'], entry['s'], entry['p']))
            elif kind == 'c3':
                modules.append(C3(entry['c_in'], entry['c_out'],
                                  entry['n'], entry['shortcut']))
            elif kind == 'sppf':
                modules.append(SPPF(entry['c_in'], entry['c_out'],
                                    entry['pool_k']))
            elif kind == 'up':
                modules.append(nn.Upsample(scale_factor=2, mode='nearest'))
            elif kind == 'cat':
                modules.append(Concat())
            elif kind == 'detect':
                modules.append(Detect(
                    config.num_classes, config.anchors.tolist(),
                    list(config.strides), entry['c_ins']))
        self.model = nn.ModuleList(modules)

    def forward(self, x):
        saved = {}
        prev = x
        out = None
        for i, entry in enumerate(self.config.layers):
            kind = entry['kind']
            frm = entry['frm']
            mod = self.model[i]
            if kind == 'cat':
                srcs = [prev if f == -1 else saved[f] for f in frm]
                prev = mod(srcs)
            elif kind == 'detect':
                srcs = [saved[f] for f in frm]
                out = mod(srcs)
            else:
                src = prev if frm == -1 else saved[frm]
                prev = mod(src)
            if i in self.config.save_indices:
                saved[i] = prev
        return out


def make_torch_model(config, seed=0):
    """Random-weight torch model in eval mode (BN uses running stats)."""

    torch.manual_seed(seed)
    model = TorchYolo(config)
    # Randomize BN running stats so fusion is actually exercised
    rng = np.random.RandomState(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(torch.tensor(
                rng.uniform(-1, 1, n), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 2.0, n), dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(
                rng.uniform(0.5, 1.5, n), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(
                rng.uniform(-0.5, 0.5, n), dtype=torch.float32))
    model.eval()
    return model
