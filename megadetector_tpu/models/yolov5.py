"""
YOLOv5-family detection network, TPU-native.

This is the network behind MDv5a/MDv5b (YOLOv5l6: CSP backbone with C3
blocks + SPPF, PAN feature pyramid, anchor-based detect heads at strides
8/16/32/64). The reference runs it through the pickled torch module from the
ultralytics-yolov5 package (megadetector/detection/pytorch_detector.py:1313);
here it is re-implemented from the published architecture as pure functional
JAX over NHWC tensors so XLA can tile the convolutions onto the MXU and fuse
the elementwise chain (SiLU, concat, decode) into them.

Design notes:
- Inference-only graph: BatchNorm is folded into conv weights at checkpoint
  conversion time (the reference similarly calls .fuse() at load,
  pytorch_detector.py:929), so a "Conv" here is conv + bias + SiLU.
- Params are plain nested dicts (pytrees): trivially convertible from torch
  state dicts, shardable with jax.sharding, and free of framework state.
- The architecture is config-driven; all published depth/width variants
  (n/s/m/l/x and their P6 -6 versions) build from one table.
- Anchor-grid decode is part of apply(): raw head outputs are decoded to
  (cx, cy, w, h, obj, cls...) in canvas pixels inside the jitted program.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


#%% Architecture configs

# (depth_multiple, width_multiple) per published variant
VARIANT_MULTIPLES = {
    'n': (0.33, 0.25),
    's': (0.33, 0.50),
    'm': (0.67, 0.75),
    'l': (1.00, 1.00),
    'x': (1.33, 1.25),
}

# P5 anchors (strides 8/16/32), pixel units at the native image scale
ANCHORS_P5 = [
    [(10, 13), (16, 30), (33, 23)],
    [(30, 61), (62, 45), (59, 119)],
    [(116, 90), (156, 198), (373, 326)],
]

# P6 anchors (strides 8/16/32/64) used by the -6 1280px variants (= MDv5)
ANCHORS_P6 = [
    [(19, 27), (44, 40), (38, 94)],
    [(96, 68), (86, 152), (180, 137)],
    [(140, 301), (303, 264), (238, 542)],
    [(436, 615), (739, 380), (925, 792)],
]

# Layer spec: (from, repeats, kind, args)
#   kind 'conv': args = (c_out, kernel, stride)
#   kind 'c3':   args = (c_out, shortcut)
#   kind 'sppf': args = (c_out, pool_kernel)
#   kind 'up':   nearest 2x upsample
#   kind 'cat':  'from' is a list of layer indices (-1 = previous)
#   kind 'detect': 'from' is the list of pyramid outputs

P5_LAYERS = [
    (-1, 1, 'conv', (64, 6, 2, 2)),  # 0  P1/2 (explicit pad 2)
    (-1, 1, 'conv', (128, 3, 2)),    # 1  P2/4
    (-1, 3, 'c3', (128, True)),      # 2
    (-1, 1, 'conv', (256, 3, 2)),    # 3  P3/8
    (-1, 6, 'c3', (256, True)),      # 4
    (-1, 1, 'conv', (512, 3, 2)),    # 5  P4/16
    (-1, 9, 'c3', (512, True)),      # 6
    (-1, 1, 'conv', (1024, 3, 2)),   # 7  P5/32
    (-1, 3, 'c3', (1024, True)),     # 8
    (-1, 1, 'sppf', (1024, 5)),      # 9
    (-1, 1, 'conv', (512, 1, 1)),    # 10
    (-1, 1, 'up', ()),               # 11
    ([-1, 6], 1, 'cat', ()),         # 12
    (-1, 3, 'c3', (512, False)),     # 13
    (-1, 1, 'conv', (256, 1, 1)),    # 14
    (-1, 1, 'up', ()),               # 15
    ([-1, 4], 1, 'cat', ()),         # 16
    (-1, 3, 'c3', (256, False)),     # 17 P3 out
    (-1, 1, 'conv', (256, 3, 2)),    # 18
    ([-1, 14], 1, 'cat', ()),        # 19
    (-1, 3, 'c3', (512, False)),     # 20 P4 out
    (-1, 1, 'conv', (512, 3, 2)),    # 21
    ([-1, 10], 1, 'cat', ()),        # 22
    (-1, 3, 'c3', (1024, False)),    # 23 P5 out
    ([17, 20, 23], 1, 'detect', ()),  # 24
]

P6_LAYERS = [
    (-1, 1, 'conv', (64, 6, 2, 2)),  # 0  P1/2 (explicit pad 2)
    (-1, 1, 'conv', (128, 3, 2)),    # 1  P2/4
    (-1, 3, 'c3', (128, True)),      # 2
    (-1, 1, 'conv', (256, 3, 2)),    # 3  P3/8
    (-1, 6, 'c3', (256, True)),      # 4
    (-1, 1, 'conv', (512, 3, 2)),    # 5  P4/16
    (-1, 9, 'c3', (512, True)),      # 6
    (-1, 1, 'conv', (768, 3, 2)),    # 7  P5/32
    (-1, 3, 'c3', (768, True)),      # 8
    (-1, 1, 'conv', (1024, 3, 2)),   # 9  P6/64
    (-1, 3, 'c3', (1024, True)),     # 10
    (-1, 1, 'sppf', (1024, 5)),      # 11
    (-1, 1, 'conv', (768, 1, 1)),    # 12
    (-1, 1, 'up', ()),               # 13
    ([-1, 8], 1, 'cat', ()),         # 14
    (-1, 3, 'c3', (768, False)),     # 15
    (-1, 1, 'conv', (512, 1, 1)),    # 16
    (-1, 1, 'up', ()),               # 17
    ([-1, 6], 1, 'cat', ()),         # 18
    (-1, 3, 'c3', (512, False)),     # 19
    (-1, 1, 'conv', (256, 1, 1)),    # 20
    (-1, 1, 'up', ()),               # 21
    ([-1, 4], 1, 'cat', ()),         # 22
    (-1, 3, 'c3', (256, False)),     # 23 P3 out
    (-1, 1, 'conv', (256, 3, 2)),    # 24
    ([-1, 20], 1, 'cat', ()),        # 25
    (-1, 3, 'c3', (512, False)),     # 26 P4 out
    (-1, 1, 'conv', (512, 3, 2)),    # 27
    ([-1, 16], 1, 'cat', ()),        # 28
    (-1, 3, 'c3', (768, False)),     # 29 P5 out
    (-1, 1, 'conv', (768, 3, 2)),    # 30
    ([-1, 12], 1, 'cat', ()),        # 31
    (-1, 3, 'c3', (1024, False)),    # 32 P6 out
    ([23, 26, 29, 32], 1, 'detect', ()),  # 33
]


def make_divisible(x, divisor=8):
    """Round channel counts up to the nearest multiple of [divisor]."""

    return int(math.ceil(x / divisor) * divisor)


class YoloV5Config:
    """Resolved architecture: per-layer channel counts, strides, anchors."""

    def __init__(self, arch='yolov5l6', num_classes=3, anchors=None):
        assert arch.startswith('yolov5'), 'Unknown arch {}'.format(arch)
        suffix = arch[len('yolov5'):]
        p6 = suffix.endswith('6')
        variant = suffix[:-1] if p6 else suffix
        assert variant in VARIANT_MULTIPLES, \
            'Unknown yolov5 variant {}'.format(variant)

        self.arch = arch
        self.num_classes = num_classes
        gd, gw = VARIANT_MULTIPLES[variant]
        self.depth_multiple = gd
        self.width_multiple = gw
        spec = P6_LAYERS if p6 else P5_LAYERS
        self.strides = (8, 16, 32, 64) if p6 else (8, 16, 32)
        default_anchors = ANCHORS_P6 if p6 else ANCHORS_P5
        self.anchors = np.asarray(
            anchors if anchors is not None else default_anchors,
            dtype=np.float32)
        self.num_anchors = self.anchors.shape[1]
        self.max_stride = self.strides[-1]

        # Resolve per-layer output channels and repeat counts.
        # channels[0] is the network input; layer f's output channel count
        # lives at channels[f + 1].
        self.layers = []
        channels = [3]

        def ch(f):
            return channels[-1] if f == -1 else channels[f + 1]

        for (frm, repeats, kind, args) in spec:
            n = max(round(repeats * gd), 1) if repeats > 1 else repeats
            if kind == 'conv':
                c_out = make_divisible(args[0] * gw)
                pad = args[3] if len(args) > 3 else args[1] // 2
                entry = dict(frm=frm, kind=kind, n=1, c_in=ch(frm),
                             c_out=c_out, k=args[1], s=args[2], p=pad)
            elif kind == 'c3':
                c_out = make_divisible(args[0] * gw)
                entry = dict(frm=frm, kind=kind, n=n, c_in=ch(frm),
                             c_out=c_out, shortcut=args[1])
            elif kind == 'sppf':
                c_out = make_divisible(args[0] * gw)
                entry = dict(frm=frm, kind=kind, n=1, c_in=ch(frm),
                             c_out=c_out, pool_k=args[1])
            elif kind == 'up':
                c_out = ch(frm)
                entry = dict(frm=frm, kind=kind, n=1, c_out=c_out)
            elif kind == 'cat':
                c_out = sum(ch(f) for f in frm)
                entry = dict(frm=frm, kind=kind, n=1, c_out=c_out)
            elif kind == 'detect':
                entry = dict(frm=frm, kind=kind, n=1,
                             c_ins=[ch(f) for f in frm], c_out=0)
            else:
                raise ValueError(kind)
            self.layers.append(entry)
            channels.append(entry['c_out'])

        # Which layer outputs must be retained for later layers
        needed = set()
        for i, entry in enumerate(self.layers):
            frm = entry['frm']
            srcs = frm if isinstance(frm, list) else [frm]
            for f in srcs:
                if f != -1:
                    needed.add(f)
        self.save_indices = needed

    @property
    def num_outputs(self):
        return self.num_classes + 5


#%% Parameter initialization (tests / training-from-scratch use)


def _init_conv(rng, c_in, c_out, k):
    """He-normal conv weight [k, k, c_in, c_out] + zero bias (numpy RNG:
    test/bench initialization only, so host-side generation is fine and much
    faster than threefry on CPU)."""

    fan_in = c_in * k * k
    std = math.sqrt(2.0 / fan_in)
    w = rng.standard_normal((k, k, c_in, c_out)).astype(np.float32) * std
    return {'w': w, 'b': np.zeros((c_out,), dtype=np.float32)}


def _init_c3(rng, c_in, c_out, n):
    c_h = int(c_out * 0.5)
    params = {
        'cv1': _init_conv(rng, c_in, c_h, 1),
        'cv2': _init_conv(rng, c_in, c_h, 1),
        'cv3': _init_conv(rng, 2 * c_h, c_out, 1),
    }
    for j in range(n):
        params['m{}'.format(j)] = {
            'cv1': _init_conv(rng, c_h, c_h, 1),
            'cv2': _init_conv(rng, c_h, c_h, 3),
        }
    return params


def init_params(config, seed=0):
    """Random parameters for [config]; used by tests and benchmarks."""

    rng = np.random.RandomState(seed)
    params = {}
    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        if kind == 'conv':
            params[name] = _init_conv(
                rng, entry['c_in'], entry['c_out'], entry['k'])
        elif kind == 'c3':
            params[name] = _init_c3(
                rng, entry['c_in'], entry['c_out'], entry['n'])
        elif kind == 'sppf':
            c_h = entry['c_in'] // 2
            params[name] = {
                'cv1': _init_conv(rng, entry['c_in'], c_h, 1),
                'cv2': _init_conv(rng, c_h * 4, entry['c_out'], 1),
            }
        elif kind == 'detect':
            no = config.num_outputs * config.num_anchors
            heads = {}
            for lvl, c_in in enumerate(entry['c_ins']):
                heads['m{}'.format(lvl)] = _init_conv(rng, c_in, no, 1)
            params[name] = heads
    return params


#%% Forward


def conv_geom(stride, pad, k):
    """Normalize conv geometry: stride -> 2-tuple, pad -> [(t,b),(l,r)]
    (int/None inputs keep the classic square k//2 behavior)."""

    if isinstance(stride, int):
        stride = (stride, stride)
    if pad is None:
        pad = k // 2
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    return stride, pad


def _conv(params, x, stride, dtype=None, pad=None):
    """
    Fused conv + bias + SiLU over NHWC. Three parameter flavors:
    float 'w' (bf16/f32 path), int8 'w_q' without scales (dynamic /
    calibration path), and int8 'w_q' with calibrated x_scale/y_scale
    (CHAIN mode: int8 in, int8 out — see ops/quantization.py).
    stride/pad accept the folded-layout tuple forms (see ops/folding.py).
    """

    from megadetector_tpu.ops import quantization as q

    if 'w_q' in params:
        k = params['w_q'].shape[0]
        p = k // 2 if pad is None else pad
        if 'y_scale' in params:
            return q.chained_conv(params, x, stride, p, act=True)
        x = q.qt_dequant(x, dtype) if isinstance(x, q.QTensor) else x
        if q._CALIBRATION_COLLECTOR is not None:
            q._CALIBRATION_COLLECTOR.append(
                (id(params), 'in',
                 jnp.max(jnp.abs(x.astype(jnp.float32)))))
        y = q.quantized_conv(params, x, stride, p, act=True,
                             accum_dtype=dtype or x.dtype)
        if q._CALIBRATION_COLLECTOR is not None:
            q._CALIBRATION_COLLECTOR.append(
                (id(params), 'out',
                 jnp.max(jnp.abs(y.astype(jnp.float32)))))
        return y

    if isinstance(x, q.QTensor):
        x = q.qt_dequant(x, dtype or jnp.float32)
    w = params['w']
    b = params['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    strides, pads = conv_geom(stride, pad, w.shape[0])
    from megadetector_tpu.ops import im2col
    if im2col.routes(w.shape):
        # Thin-input stem conv as patches + one GEMM: raises the MXU
        # contraction from C_in lanes per tap to kh*kw*C_in (see
        # ops/im2col.py). Exact MAC set; f32 reduction order changes.
        y = im2col.conv_im2col(x, w, strides, pads)
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=strides,
            padding=pads,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
    y = y + b
    y = y * jax.nn.sigmoid(y)
    # Float-compute / int8-storage nodes: MXU runs bf16 (int8 convs
    # regress at <=128 channels) but the output tensor is stored int8,
    # halving the dominant HBM traffic of the early high-res layers
    if isinstance(params, q.QConvParams):
        if q._CALIBRATION_COLLECTOR is not None:
            q._CALIBRATION_COLLECTOR.append(
                (id(params), 'out',
                 jnp.max(jnp.abs(y.astype(jnp.float32)))))
        if 'y_scale' in params:
            return q.qt_quantize(y, float(params['y_scale']))
    return y


def _conv_linear(params, x, dtype=None):
    """1x1 conv + bias with no activation (detect heads)."""

    from megadetector_tpu.ops import quantization as q

    if isinstance(x, q.QTensor):
        x = q.qt_dequant(x, dtype or jnp.float32)
    w = params['w']
    b = params['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b


def _c3_folded(params, x, n, shortcut, dtype=None):
    """C3 on the folded layout (see ops/folding.py): cv1||cv2 run as one
    merged 1x1 ('cv12', output [fold(y1) | fold(y2)]), bottlenecks use
    folded kernels, cv3 consumes the folded concat."""

    from megadetector_tpu.ops import quantization as q

    y12 = _conv(params['cv12'], x, 1, dtype, pad=0)
    half = y12.shape[-1] // 2
    if isinstance(y12, q.QTensor):
        y1 = q.QTensor(y12.q[..., :half], y12.scale)
        y2 = q.QTensor(y12.q[..., half:], y12.scale)
    else:
        y1 = y12[..., :half]
        y2 = y12[..., half:]
    for j in range(n):
        m = params['m{}'.format(j)]
        # The folded bottleneck is the same fusable shape (1x1 C->C,
        # 3x3 C->C SAME, add) — the folded 3x3 kernel already encodes
        # the original receptive field, so the fused Pallas kernel
        # applies unchanged (see ops/pallas_bottleneck.py)
        fused = q.fused_bottleneck(m, y1, shortcut)
        if fused is not None:
            y1 = fused
            continue
        h = _conv(m['cv1'], y1, 1, dtype, pad=0)
        h = _conv(m['cv2'], h, 1, dtype, pad=1)
        y1 = q.qt_add(y1, h) if shortcut else h
    y = q.qt_concat([y1, y2], axis=-1)
    return _conv(params['cv3'], y, 1, dtype, pad=0)


def _apply_folded_layer(i, entry, params_i, src, dtype):
    """Run early layer i (0..3) in the folded layout. l0 folds the input
    by 4 in width (a pure reshape of the row-major pixel stream) and the
    chain stays folded until l3 emits the normal layout."""

    if i == 0:
        b, h, w, c = src.shape
        wk = params_i.get('w', params_i.get('w_q'))
        if c == 24:
            # Input already in the h2+w4 folded layout (the device
            # letterbox emitted it via preprocess_device
            # fold_canvas_h2 — no relayout in this program)
            assert wk.shape[0] == 3, \
                'Pre-folded h2 input needs an h2-folded l0 kernel'
            return _conv(params_i, src, (1, 1), dtype,
                         pad=((1, 1), (1, 1)))
        assert c == 3 and w % 4 == 0, \
            'Folded l0 needs RGB input with width % 4 == 0'
        xf = src.reshape(b, h, w // 4, 12)
        if wk.shape[0] == 3:
            # h2+w4 fold (ops/folding.fold_l0_h2): pack the row parity
            # into channels too — [B, H/2, W/4, 24], q*12+g order —
            # so the kernel is [3,3,24,*] at stride (1,1)
            assert h % 2 == 0, 'h2-folded l0 needs an even canvas height'
            xf = xf.reshape(b, h // 2, 2, w // 4, 12)
            xf = xf.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, w // 4, 24)
            return _conv(params_i, xf, (1, 1), dtype, pad=((1, 1), (1, 1)))
        return _conv(params_i, xf, (2, 1), dtype, pad=((2, 2), (1, 1)))
    if i == 1:
        return _conv(params_i, src, (2, 2), dtype, pad=((1, 1), (1, 1)))
    if i == 2:
        return _c3_folded(params_i, src, entry['n'], entry['shortcut'],
                          dtype)
    if i == 3:
        return _conv(params_i, src, (2, 1), dtype, pad=((1, 1), (1, 0)))
    raise ValueError(i)


def _c3(params, x, n, shortcut, dtype=None):
    from megadetector_tpu.ops import quantization as q

    y1 = _conv(params['cv1'], x, 1, dtype)
    y2 = _conv(params['cv2'], x, 1, dtype)
    for j in range(n):
        m = params['m{}'.format(j)]
        # Pallas backend: the whole bottleneck (1x1 -> 3x3 -> add) runs
        # as one fused int8 kernel, bit-exact vs the unfused chain
        fused = q.fused_bottleneck(m, y1, shortcut)
        if fused is not None:
            y1 = fused
            continue
        h = _conv(m['cv1'], y1, 1, dtype)
        h = _conv(m['cv2'], h, 1, dtype)
        y1 = q.qt_add(y1, h) if shortcut else h
    y = q.qt_concat([y1, y2], axis=-1)
    return _conv(params['cv3'], y, 1, dtype)


def _sppf(params, x, pool_k, dtype=None):
    from megadetector_tpu.ops import quantization as q

    y = _conv(params['cv1'], x, 1, dtype)
    pools = [y]
    cur = y
    for _ in range(3):
        cur = q.qt_maxpool(cur, pool_k)
        pools.append(cur)
    y = q.qt_concat(pools, axis=-1)
    return _conv(params['cv2'], y, 1, dtype)


def _upsample2x(x):
    """Nearest-neighbor 2x upsample over NHWC (int8-aware)."""

    from megadetector_tpu.ops import quantization as q

    return q.qt_upsample2x(x)


def _decode_level(raw, anchors_level, stride, num_outputs, out_dtype):
    """
    Anchor-grid decode for one pyramid level.

    raw: [B, H, W, na*(5+nc)] -> [B, H*W*na, 5+nc] with xy/wh in canvas
    pixels (YOLOv5 v6 decode: xy = (2*sig - 0.5 + grid) * stride,
    wh = (2*sig)^2 * anchor).
    """

    b, h, w, _ = raw.shape
    na = anchors_level.shape[0]
    x = raw.reshape(b, h, w, na, num_outputs).astype(out_dtype)
    y = jax.nn.sigmoid(x)

    grid_x = jax.lax.broadcasted_iota(out_dtype, (h, w), 1)
    grid_y = jax.lax.broadcasted_iota(out_dtype, (h, w), 0)
    grid = jnp.stack([grid_x, grid_y], axis=-1)  # [H, W, 2]

    xy = (y[..., 0:2] * 2.0 - 0.5 + grid[None, :, :, None, :]) * stride
    anchor = jnp.asarray(anchors_level, dtype=out_dtype)
    wh = jnp.square(y[..., 2:4] * 2.0) * anchor[None, None, None, :, :]
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    return out.reshape(b, h * w * na, num_outputs)


def apply(config, params, x, dtype=None, decode=True):
    """
    Run the network.

    Args:
        config: YoloV5Config
        params: parameter pytree from init_params / the weight converter
        x: [B, H, W, 3] float images in [0, 1]; H and W must be multiples
            of config.max_stride
        dtype: compute dtype (None = dtype of x); decode always emits f32
        decode: when True, return decoded predictions [B, A, 5+nc];
            otherwise the list of raw per-level head outputs

    Returns:
        [B, A, 5+nc] decoded predictions (or raw head list)
    """

    from megadetector_tpu.ops import folding

    if dtype is not None:
        x = x.astype(dtype)
    saved = {}
    prev = x
    head_outputs = None
    folded = folding.params_are_folded(params)

    for i, entry in enumerate(config.layers):
        kind = entry['kind']
        name = 'l{}'.format(i)
        frm = entry['frm']

        if folded and i < 4:
            src = prev if frm == -1 else saved[frm]
            out = _apply_folded_layer(i, entry, params[name], src, dtype)
        elif kind == 'conv':
            src = prev if frm == -1 else saved[frm]
            out = _conv(params[name], src, entry['s'], dtype,
                        pad=entry['p'])
        elif kind == 'c3':
            src = prev if frm == -1 else saved[frm]
            out = _c3(params[name], src, entry['n'], entry['shortcut'],
                      dtype)
        elif kind == 'sppf':
            src = prev if frm == -1 else saved[frm]
            out = _sppf(params[name], src, entry['pool_k'], dtype)
        elif kind == 'up':
            src = prev if frm == -1 else saved[frm]
            out = _upsample2x(src)
        elif kind == 'cat':
            from megadetector_tpu.ops import quantization as q
            srcs = [prev if f == -1 else saved[f] for f in frm]
            out = q.qt_concat(srcs, axis=-1)
        elif kind == 'detect':
            head_outputs = []
            for lvl, f in enumerate(frm):
                src = saved[f]
                head_outputs.append(
                    _conv_linear(params[name]['m{}'.format(lvl)], src,
                                 dtype))
            out = prev
        else:
            raise ValueError(kind)

        if i in config.save_indices:
            saved[i] = out
        prev = out

    assert head_outputs is not None, 'Config has no detect layer'
    if not decode:
        return head_outputs

    decoded = []
    for lvl, raw in enumerate(head_outputs):
        decoded.append(_decode_level(
            raw, config.anchors[lvl], float(config.strides[lvl]),
            config.num_outputs, jnp.float32))
    return jnp.concatenate(decoded, axis=1)


def num_params(params):
    """Total parameter count of a pytree."""

    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
