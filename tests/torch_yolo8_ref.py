"""
Test-only torch implementation of the YOLOv8 architecture, with submodule
names matching ultralytics checkpoints ('model.{i}.cv1.conv.weight', head
'model.22.cv2.{lvl}.{k}', ...), used to validate the JAX network and the
ultralytics state-dict converter.
"""

import numpy as np
import torch
import torch.nn as nn


class Conv(nn.Module):

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):

    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3, 1)
        self.cv2 = Conv(c2, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):

    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


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
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class DFL(nn.Module):
    """Fixed arange projection over reg_max bins."""

    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(
            c1, dtype=torch.float).view(1, c1, 1, 1)
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class Detect(nn.Module):

    def __init__(self, nc, ch, reg_max=16, strides=(8, 16, 32)):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        self.strides = strides
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for c in ch)
        self.dfl = DFL(reg_max)

    def forward(self, xs):
        outs = []
        for i, x in enumerate(xs):
            box = self.cv2[i](x)
            cls = self.cv3[i](x)
            b, _, h, w = box.shape
            box_flat = box.view(b, 4 * self.reg_max, h * w)
            dist = self.dfl(box_flat)  # [B, 4, A] = l, t, r, b in cells
            yv, xv = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing='ij')
            gx = (xv.float() + 0.5).reshape(-1)
            gy = (yv.float() + 0.5).reshape(-1)
            x0 = gx - dist[:, 0]
            y0 = gy - dist[:, 1]
            x1 = gx + dist[:, 2]
            y1 = gy + dist[:, 3]
            stride = self.strides[i]
            cx = (x0 + x1) / 2 * stride
            cy = (y0 + y1) / 2 * stride
            bw = (x1 - x0) * stride
            bh = (y1 - y0) * stride
            scores = cls.view(b, self.nc, h * w).sigmoid()
            obj = torch.ones((b, 1, h * w))
            out = torch.cat(
                [cx.unsqueeze(1), cy.unsqueeze(1), bw.unsqueeze(1),
                 bh.unsqueeze(1), obj, scores], dim=1)
            outs.append(out)
        return torch.cat(outs, dim=2).transpose(1, 2)  # [B, A, 5+nc]


class TorchYoloV8(nn.Module):
    """Graph executor over a YoloV8Config with ultralytics-style names."""

    def __init__(self, config):
        super().__init__()
        self.config = config
        modules = []
        for entry in config.layers:
            kind = entry['kind']
            if kind == 'conv':
                modules.append(Conv(entry['c_in'], entry['c_out'],
                                    entry['k'], entry['s']))
            elif kind == 'c2f':
                modules.append(C2f(entry['c_in'], entry['c_out'],
                                   entry['n'], entry['shortcut']))
            elif kind == 'sppf':
                modules.append(SPPF(entry['c_in'], entry['c_out'],
                                    entry['pool_k']))
            elif kind == 'up':
                modules.append(nn.Upsample(scale_factor=2,
                                           mode='nearest'))
            elif kind == 'cat':
                modules.append(nn.Identity())
            elif kind == 'detect':
                modules.append(Detect(config.num_classes,
                                      entry['c_ins'], config.reg_max,
                                      config.strides))
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
                prev = torch.cat(
                    [prev if f == -1 else saved[f] for f in frm], 1)
            elif kind == 'detect':
                out = mod([saved[f] for f in frm])
            else:
                prev = mod(prev if frm == -1 else saved[frm])
            if i in self.config.save_indices:
                saved[i] = prev
        return out


def make_torch_v8(config, seed=0):
    torch.manual_seed(seed)
    model = TorchYoloV8(config)
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
