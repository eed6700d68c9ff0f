"""
Anchor-free ultralytics-style (YOLOv8-family) detection network,
TPU-native.

This is the architecture behind the MDv1000 model family, which the
reference loads through the ultralytics package ('model_type':
'ultralytics'; routed to library NMS because of the transposed anchor-free
output layout, megadetector/detection/pytorch_detector.py:1325-1344).
Re-implemented from the published architecture: C2f backbone, SPPF, PAN
neck, decoupled detect heads with DFL box regression at strides 8/16/32.

Decode runs inside apply(): DFL bins -> expected l/t/r/b distances ->
center-format boxes in canvas pixels. To share one downstream NMS with the
YOLOv5 path, apply() emits [B, A, 5+nc] with the objectness column fixed
at 1.0 (anchor-free models score by class confidence alone, which is
exactly what obj=1 produces in obj*cls scoring).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


#%% Architecture configs

# (depth, width, max_channels)
V8_VARIANTS = {
    'n': (0.33, 0.25, 1024),
    's': (0.33, 0.50, 1024),
    'm': (0.67, 0.75, 768),
    'l': (1.00, 1.00, 512),
    'x': (1.00, 1.25, 512),
}

# (from, repeats, kind, args); kinds: conv(c,k,s), c2f(c,shortcut),
# sppf(c,k), up, cat, detect
V8_LAYERS = [
    (-1, 1, 'conv', (64, 3, 2)),     # 0  P1/2
    (-1, 1, 'conv', (128, 3, 2)),    # 1  P2/4
    (-1, 3, 'c2f', (128, True)),     # 2
    (-1, 1, 'conv', (256, 3, 2)),    # 3  P3/8
    (-1, 6, 'c2f', (256, True)),     # 4
    (-1, 1, 'conv', (512, 3, 2)),    # 5  P4/16
    (-1, 6, 'c2f', (512, True)),     # 6
    (-1, 1, 'conv', (1024, 3, 2)),   # 7  P5/32
    (-1, 3, 'c2f', (1024, True)),    # 8
    (-1, 1, 'sppf', (1024, 5)),      # 9
    (-1, 1, 'up', ()),               # 10
    ([-1, 6], 1, 'cat', ()),         # 11
    (-1, 3, 'c2f', (512, False)),    # 12
    (-1, 1, 'up', ()),               # 13
    ([-1, 4], 1, 'cat', ()),         # 14
    (-1, 3, 'c2f', (256, False)),    # 15 P3 out
    (-1, 1, 'conv', (256, 3, 2)),    # 16
    ([-1, 12], 1, 'cat', ()),        # 17
    (-1, 3, 'c2f', (512, False)),    # 18 P4 out
    (-1, 1, 'conv', (512, 3, 2)),    # 19
    ([-1, 9], 1, 'cat', ()),         # 20
    (-1, 3, 'c2f', (1024, False)),   # 21 P5 out
    ([15, 18, 21], 1, 'detect', ()),  # 22
]

REG_MAX = 16


def _make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


class YoloV8Config:
    """Resolved YOLOv8 architecture."""

    def __init__(self, arch='yolov8l', num_classes=3):
        assert arch.startswith('yolov8'), 'Unknown arch {}'.format(arch)
        variant = arch[len('yolov8'):]
        assert variant in V8_VARIANTS, \
            'Unknown yolov8 variant {}'.format(variant)
        gd, gw, max_ch = V8_VARIANTS[variant]

        self.arch = arch
        self.num_classes = num_classes
        self.strides = (8, 16, 32)
        self.max_stride = 32
        self.reg_max = REG_MAX

        self.layers = []
        channels = [3]

        def ch(f):
            return channels[-1] if f == -1 else channels[f + 1]

        def scale_c(c):
            return _make_divisible(min(c, max_ch) * gw)

        for (frm, repeats, kind, args) in V8_LAYERS:
            n = max(round(repeats * gd), 1) if repeats > 1 else repeats
            if kind == 'conv':
                entry = dict(frm=frm, kind=kind, n=1, c_in=ch(frm),
                             c_out=scale_c(args[0]), k=args[1], s=args[2])
            elif kind == 'c2f':
                entry = dict(frm=frm, kind=kind, n=n, c_in=ch(frm),
                             c_out=scale_c(args[0]), shortcut=args[1])
            elif kind == 'sppf':
                entry = dict(frm=frm, kind=kind, n=1, c_in=ch(frm),
                             c_out=scale_c(args[0]), pool_k=args[1])
            elif kind == 'up':
                entry = dict(frm=frm, kind=kind, n=1, c_out=ch(frm))
            elif kind == 'cat':
                entry = dict(frm=frm, kind=kind, n=1,
                             c_out=sum(ch(f) for f in frm))
            elif kind == 'detect':
                entry = dict(frm=frm, kind=kind, n=1,
                             c_ins=[ch(f) for f in frm], c_out=0)
            self.layers.append(entry)
            channels.append(entry['c_out'])

        # Which layer outputs later layers consume
        needed = set()
        for entry in self.layers:
            frm = entry['frm']
            for f in (frm if isinstance(frm, list) else [frm]):
                if f != -1:
                    needed.add(f)
        self.save_indices = needed

        # Detect-head branch widths (ultralytics conventions)
        detect = self.layers[-1]
        ch0 = detect['c_ins'][0]
        self.head_c2 = max(16, ch0 // 4, self.reg_max * 4)
        self.head_c3 = max(ch0, min(num_classes, 100))


#%% Initialization


def _conv_slot(rng, c_in, c_out, k):
    fan_in = c_in * k * k
    std = math.sqrt(2.0 / fan_in)
    return {'w': rng.standard_normal((k, k, c_in, c_out))
            .astype(np.float32) * std,
            'b': np.zeros((c_out,), np.float32)}


def init_params(config, seed=0):
    """Random parameters for tests/benchmarks."""

    rng = np.random.RandomState(seed)
    params = {}
    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        if kind == 'conv':
            params[name] = _conv_slot(rng, entry['c_in'],
                                      entry['c_out'], entry['k'])
        elif kind == 'c2f':
            c_h = entry['c_out'] // 2
            node = {
                'cv1': _conv_slot(rng, entry['c_in'], 2 * c_h, 1),
                'cv2': _conv_slot(rng, (2 + entry['n']) * c_h,
                                  entry['c_out'], 1),
            }
            for j in range(entry['n']):
                node['m{}'.format(j)] = {
                    'cv1': _conv_slot(rng, c_h, c_h, 3),
                    'cv2': _conv_slot(rng, c_h, c_h, 3),
                }
            params[name] = node
        elif kind == 'sppf':
            c_h = entry['c_in'] // 2
            params[name] = {
                'cv1': _conv_slot(rng, entry['c_in'], c_h, 1),
                'cv2': _conv_slot(rng, c_h * 4, entry['c_out'], 1),
            }
        elif kind == 'detect':
            heads = {}
            for lvl, c_in in enumerate(entry['c_ins']):
                heads['box{}'.format(lvl)] = {
                    'cv0': _conv_slot(rng, c_in, config.head_c2, 3),
                    'cv1': _conv_slot(rng, config.head_c2,
                                      config.head_c2, 3),
                    'out': _conv_slot(rng, config.head_c2,
                                      4 * config.reg_max, 1),
                }
                heads['cls{}'.format(lvl)] = {
                    'cv0': _conv_slot(rng, c_in, config.head_c3, 3),
                    'cv1': _conv_slot(rng, config.head_c3,
                                      config.head_c3, 3),
                    'out': _conv_slot(rng, config.head_c3,
                                      config.num_classes, 1),
                }
            params[name] = heads
    return params


#%% Forward

from megadetector_tpu.models.yolov5 import (  # noqa: E402
    _conv, _conv_linear, _sppf, _upsample2x)


def _c2f(params, x, n, shortcut, dtype=None):
    y = _conv(params['cv1'], x, 1, dtype)
    c_h = y.shape[-1] // 2
    parts = [y[..., :c_h], y[..., c_h:]]
    cur = parts[-1]
    for j in range(n):
        m = params['m{}'.format(j)]
        h = _conv(m['cv1'], cur, 1, dtype)
        h = _conv(m['cv2'], h, 1, dtype)
        cur = cur + h if shortcut else h
        parts.append(cur)
    y = jnp.concatenate(parts, axis=-1)
    return _conv(params['cv2'], y, 1, dtype)


def _decode_level_v8(box_raw, cls_raw, stride, reg_max, out_dtype):
    """
    DFL decode for one level: [B, H, W, 4*reg_max] box bins +
    [B, H, W, nc] class logits -> [B, H*W, 5+nc] with obj=1.
    """

    b, h, w, _ = box_raw.shape
    nc = cls_raw.shape[-1]

    bins = box_raw.reshape(b, h, w, 4, reg_max).astype(out_dtype)
    probs = jax.nn.softmax(bins, axis=-1)
    proj = jnp.arange(reg_max, dtype=out_dtype)
    dist = jnp.sum(probs * proj, axis=-1)  # [B, H, W, 4] = l, t, r, b

    grid_x = jax.lax.broadcasted_iota(out_dtype, (h, w), 1) + 0.5
    grid_y = jax.lax.broadcasted_iota(out_dtype, (h, w), 0) + 0.5

    left, top, right, bottom = (dist[..., 0], dist[..., 1],
                                dist[..., 2], dist[..., 3])
    x0 = grid_x[None] - left
    y0 = grid_y[None] - top
    x1 = grid_x[None] + right
    y1 = grid_y[None] + bottom
    cx = (x0 + x1) / 2.0 * stride
    cy = (y0 + y1) / 2.0 * stride
    bw = (x1 - x0) * stride
    bh = (y1 - y0) * stride

    cls = jax.nn.sigmoid(cls_raw.astype(out_dtype))
    obj = jnp.ones((b, h, w, 1), out_dtype)
    out = jnp.concatenate(
        [cx[..., None], cy[..., None], bw[..., None], bh[..., None],
         obj, cls], axis=-1)
    return out.reshape(b, h * w, 5 + nc)


def apply(config, params, x, dtype=None, decode=True):
    """
    Run the network; returns decoded [B, A, 5+nc] (obj column = 1.0) or
    raw per-level (box, cls) head outputs.
    """

    if dtype is not None:
        x = x.astype(dtype)
    saved = {}
    prev = x
    head_raw = None

    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        frm = entry['frm']
        if kind == 'conv':
            src = prev if frm == -1 else saved[frm]
            out = _conv(params[name], src, entry['s'], dtype)
        elif kind == 'c2f':
            src = prev if frm == -1 else saved[frm]
            out = _c2f(params[name], src, entry['n'], entry['shortcut'],
                       dtype)
        elif kind == 'sppf':
            src = prev if frm == -1 else saved[frm]
            out = _sppf(params[name], src, entry['pool_k'], dtype)
        elif kind == 'up':
            src = prev if frm == -1 else saved[frm]
            out = _upsample2x(src)
        elif kind == 'cat':
            out = jnp.concatenate(
                [prev if f == -1 else saved[f] for f in frm], axis=-1)
        elif kind == 'detect':
            head_raw = []
            heads = params[name]
            for lvl, f in enumerate(frm):
                src = saved[f]
                bb = heads['box{}'.format(lvl)]
                box = _conv(bb['cv0'], src, 1, dtype)
                box = _conv(bb['cv1'], box, 1, dtype)
                box = _conv_linear(bb['out'], box, dtype)
                cb = heads['cls{}'.format(lvl)]
                cls = _conv(cb['cv0'], src, 1, dtype)
                cls = _conv(cb['cv1'], cls, 1, dtype)
                cls = _conv_linear(cb['out'], cls, dtype)
                head_raw.append((box, cls))
            out = prev
        else:
            raise ValueError(kind)
        if i in config.save_indices:
            saved[i] = out
        prev = out

    assert head_raw is not None
    if not decode:
        return head_raw

    decoded = [
        _decode_level_v8(box, cls, float(config.strides[lvl]),
                         config.reg_max, jnp.float32)
        for lvl, (box, cls) in enumerate(head_raw)]
    return jnp.concatenate(decoded, axis=1)


#%% Conversion from ultralytics state dicts


def convert_ultralytics_state_dict(state_dict, config):
    """
    Map an ultralytics YOLOv8 torch state dict onto [config]'s layer
    structure. Key layout: 'model.{i}.cv1.conv.weight',
    'model.{i}.m.{j}.cv1...', detect head 'model.22.cv2.{lvl}.{k}...' (box
    branch) and 'model.22.cv3.{lvl}.{k}...' (cls branch), plus a fixed
    'model.22.dfl.conv.weight' (the arange projection, not a learned
    parameter). Returns the params pytree.
    """

    from megadetector_tpu.models.convert_weights import _TorchKeyReader

    reader = _TorchKeyReader(state_dict)
    params = {}

    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        base = str(i)
        if kind == 'conv':
            params[name] = reader.conv(base)
        elif kind == 'c2f':
            node = {
                'cv1': reader.conv(base + '.cv1'),
                'cv2': reader.conv(base + '.cv2'),
            }
            for j in range(entry['n']):
                node['m{}'.format(j)] = {
                    'cv1': reader.conv('{}.m.{}.cv1'.format(base, j)),
                    'cv2': reader.conv('{}.m.{}.cv2'.format(base, j)),
                }
            params[name] = node
        elif kind == 'sppf':
            params[name] = {
                'cv1': reader.conv(base + '.cv1'),
                'cv2': reader.conv(base + '.cv2'),
            }
        elif kind == 'detect':
            heads = {}
            for lvl in range(len(entry['frm'])):
                heads['box{}'.format(lvl)] = {
                    'cv0': reader.conv('{}.cv2.{}.0'.format(base, lvl)),
                    'cv1': reader.conv('{}.cv2.{}.1'.format(base, lvl)),
                    'out': reader.plain_conv(
                        '{}.cv2.{}.2'.format(base, lvl)),
                }
                heads['cls{}'.format(lvl)] = {
                    'cv0': reader.conv('{}.cv3.{}.0'.format(base, lvl)),
                    'cv1': reader.conv('{}.cv3.{}.1'.format(base, lvl)),
                    'out': reader.plain_conv(
                        '{}.cv3.{}.2'.format(base, lvl)),
                }
            params[name] = heads

    return params


def num_params(params):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
