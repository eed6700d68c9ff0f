"""
EfficientNetV2 image classifier, TPU-native.

This is the species-classifier backbone for the two-stage
detect -> crop -> classify pipeline (the reference delegates to the
`speciesnet` package, whose always-crop model is an EfficientNetV2-M;
invoked from megadetector/detection/run_md_and_speciesnet.py:782). Here
the network is implemented from the published architecture as pure
functional JAX over NHWC tensors: stem conv, FusedMBConv stages, MBConv
stages with squeeze-excitation, 1x1 head conv, global average pool, and a
linear classifier.

Inference-only graph: BatchNorm folds into conv weights at conversion.
Weight conversion from torchvision efficientnet_v2_* checkpoints uses
ordered tensor consumption (both graphs enumerate convs in the same
order), so no name mapping is needed.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


#%% Architecture configs
#
# Stage spec: (block, expansion, kernel, stride, channels, layers)
# block: 'fused' = FusedMBConv (no SE), 'mb' = MBConv (SE ratio 0.25)

EFFICIENTNET_V2_CONFIGS = {
    'efficientnetv2_s': {
        'stem_channels': 24,
        'stages': [
            ('fused', 1, 3, 1, 24, 2),
            ('fused', 4, 3, 2, 48, 4),
            ('fused', 4, 3, 2, 64, 4),
            ('mb', 4, 3, 2, 128, 6),
            ('mb', 6, 3, 1, 160, 9),
            ('mb', 6, 3, 2, 256, 15),
        ],
        'head_channels': 1280,
    },
    # Tiny test-only variant: exercises both block types + SE cheaply
    'efficientnetv2_test': {
        'stem_channels': 8,
        'stages': [
            ('fused', 1, 3, 1, 8, 1),
            ('fused', 2, 3, 2, 16, 1),
            ('mb', 2, 3, 2, 24, 1),
        ],
        'head_channels': 64,
    },
    'efficientnetv2_m': {
        'stem_channels': 24,
        'stages': [
            ('fused', 1, 3, 1, 24, 3),
            ('fused', 4, 3, 2, 48, 5),
            ('fused', 4, 3, 2, 80, 5),
            ('mb', 4, 3, 2, 160, 7),
            ('mb', 6, 3, 1, 176, 14),
            ('mb', 6, 3, 2, 304, 18),
            ('mb', 6, 3, 1, 512, 5),
        ],
        'head_channels': 1280,
    },
}


class EfficientNetConfig:
    """Resolved EfficientNetV2 architecture."""

    def __init__(self, arch='efficientnetv2_m', num_classes=1000,
                 image_size=480):
        assert arch in EFFICIENTNET_V2_CONFIGS, \
            'Unknown arch {}'.format(arch)
        self.arch = arch
        self.num_classes = num_classes
        self.image_size = image_size
        cfg = EFFICIENTNET_V2_CONFIGS[arch]
        self.stem_channels = cfg['stem_channels']
        self.stages = cfg['stages']
        self.head_channels = cfg['head_channels']


#%% Initialization


def _conv_slot(rng, c_in, c_out, k, groups=1):
    fan_in = (c_in // groups) * k * k
    std = math.sqrt(2.0 / fan_in)
    w = rng.standard_normal((k, k, c_in // groups, c_out)) \
        .astype(np.float32) * std
    return {'w': w, 'b': np.zeros((c_out,), np.float32)}


def init_params(config, seed=0, train_init=False):
    """
    Random parameters; structure mirrors apply().

    The inference graph has BatchNorm folded away, so plain He init makes
    activations explode with depth. For from-scratch training,
    [train_init] zero-initializes each residual block's projection (the
    block starts as identity, NFNet/Fixup-style) and the classifier head,
    keeping the normalization-free graph trainable.
    """

    rng = np.random.RandomState(seed)
    params = {'stem': _conv_slot(rng, 3, config.stem_channels, 3)}

    c_in = config.stem_channels
    for i_stage, (block, expansion, k, stride, c_out, layers) in \
            enumerate(config.stages):
        stage_params = []
        for i_layer in range(layers):
            s = stride if i_layer == 0 else 1
            use_residual = (s == 1 and c_in == c_out)
            block_params = {}
            c_exp = c_in * expansion
            if block == 'fused':
                if expansion == 1:
                    block_params['project'] = _conv_slot(rng, c_in, c_out, k)
                else:
                    block_params['expand'] = _conv_slot(rng, c_in, c_exp, k)
                    block_params['project'] = _conv_slot(rng, c_exp, c_out, 1)
            else:  # mbconv
                block_params['expand'] = _conv_slot(rng, c_in, c_exp, 1)
                block_params['dw'] = _conv_slot(rng, c_exp, c_exp, k,
                                                groups=c_exp)
                c_se = max(1, c_in // 4)
                block_params['se_reduce'] = _conv_slot(rng, c_exp, c_se, 1)
                block_params['se_expand'] = _conv_slot(rng, c_se, c_exp, 1)
                block_params['project'] = _conv_slot(rng, c_exp, c_out, 1)
            if train_init and use_residual:
                block_params['project']['w'] = \
                    np.zeros_like(block_params['project']['w'])
            elif train_init:
                block_params['project']['w'] *= 0.5
            stage_params.append(block_params)
            c_in = c_out
        params['stage{}'.format(i_stage)] = {
            'b{}'.format(j): bp for j, bp in enumerate(stage_params)}

    params['head'] = _conv_slot(rng, c_in, config.head_channels, 1)
    std = 1.0 / math.sqrt(config.head_channels)
    params['fc'] = {
        'w': np.zeros((config.head_channels, config.num_classes),
                      np.float32) if train_init else
        rng.uniform(-std, std, (config.head_channels,
                                config.num_classes)).astype(np.float32),
        'b': np.zeros((config.num_classes,), np.float32),
    }
    return params


#%% Stem width-folding
#
# The stem (3x3 s2, C_in=3) runs at ~1 TFLOP/s on TPU — C_in=3 uses 27
# of the MXU's 128 contraction lanes (hardware-measured,
# experiments/exp_clf_profile.py: 9.5 ms of an 83 ms V2-M b128 480px
# forward). Same disease and same cure as the detector stem
# (ops/folding.py): pack adjacent width pixels into channels with a
# FREE row-major view ([B,H,W,3] -> [B,H,W/4,12]), and rewrite the stem
# kernel so its taps reproduce the original multiply-accumulate terms
# exactly — only lane placement changes.
#
#   w4 fold: input view [B,H,W/4,12]; kernel [3,2,12,2C] stride (2,1)
#     pad ((1,1),(1,0)); the output [B,H/2,W/4,2C] is a w2-folded view
#     of the true [B,H/2,W/2,C] stem output (channel index = phase*C+o,
#     phase-major), so a second free reshape restores the normal layout
#     and the rest of the network runs unchanged.
#   w2 fold: input view [B,H,W/2,6]; kernel [3,2,6,C], output emitted
#     directly in the normal layout.


def fold_stem(params, mode='w4'):
    """
    Return a copy of [params] with the stem conv rewritten into the
    width-folded layout ('w4' or 'w2'). Pure offline weight rewrite;
    apply() detects the folded kernel shape. fold_stem(fold_stem(p)) is
    rejected; pass the original params.
    """

    import copy

    w = np.asarray(params['stem']['w'], np.float32)
    b = np.asarray(params['stem']['b'], np.float32)
    assert w.shape[:3] == (3, 3, 3), \
        'fold_stem expects an unfolded [3,3,3,C] stem, got {}'.format(
            w.shape)
    c_out = w.shape[3]

    out = dict(params)
    if mode == 'w2':
        wf = np.zeros((3, 2, 6, c_out), np.float32)
        # out col j reads cols 2j-1,2j,2j+1 = folded (j-1,phase1),
        # (j,phase0), (j,phase1)
        wf[:, 0, 3:6, :] = w[:, 0, :, :]
        wf[:, 1, 0:3, :] = w[:, 1, :, :]
        wf[:, 1, 3:6, :] = w[:, 2, :, :]
        bf = b
    elif mode == 'w4':
        wf = np.zeros((3, 2, 12, 2 * c_out), np.float32)
        # output phase 0 (col 4m'): cols 4m'-1,4m',4m'+1
        wf[:, 0, 9:12, :c_out] = w[:, 0, :, :]
        wf[:, 1, 0:3, :c_out] = w[:, 1, :, :]
        wf[:, 1, 3:6, :c_out] = w[:, 2, :, :]
        # output phase 1 (col 4m'+1): cols 4m'+1,4m'+2,4m'+3
        wf[:, 1, 3:6, c_out:] = w[:, 0, :, :]
        wf[:, 1, 6:9, c_out:] = w[:, 1, :, :]
        wf[:, 1, 9:12, c_out:] = w[:, 2, :, :]
        bf = np.concatenate([b, b])
    else:
        raise ValueError('Unknown fold mode {}'.format(mode))
    out['stem'] = {'w': wf, 'b': bf}
    # Deep-copy nothing else: the other nodes are shared unchanged
    out = {k: (copy.copy(v) if k == 'stem' else v)
           for k, v in out.items()}
    return out


def stem_is_folded(params):
    w = params['stem']['w']
    return w.shape[0] == 3 and w.shape[1] == 2


def _stem_conv(p, x, dtype=None):
    """Run the stem conv, dispatching on the (possibly folded) kernel
    shape. x: [B, H, W, 3] float; returns [B, H/2, W/2, C]."""

    w = p['w']
    if w.shape[1] == 3:
        return _conv(p, x, stride=2, dtype=dtype)

    c_in = w.shape[2]
    fold = c_in // 3
    batch, h, width, _ = x.shape
    assert width % fold == 0, \
        'folded stem requires width divisible by {} (got {}); load ' \
        'the unfolded checkpoint for this size'.format(fold, width)
    b = p['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    xf = x.reshape(batch, h, width // fold, 3 * fold)  # free view
    y = jax.lax.conv_general_dilated(
        xf, w, window_strides=(2, 1),
        padding=[(1, 1), (1, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + b
    if fold == 4:
        bo, ho, wo, co = y.shape
        y = y.reshape(bo, ho, wo * 2, co // 2)  # free unfold view
    return y * jax.nn.sigmoid(y)


#%% Forward


def _conv(p, x, stride=1, groups=1, act=True, dtype=None):
    """
    Conv + bias (+ SiLU) over NHWC. Three parameter flavors, mirroring
    models/yolov5._conv:
    - float 'w': bf16/f32 path (stem, depthwise, SE, and any
      float-policy stage)
    - int8 'w_q' without y_scale: dynamic-scale / calibration path
    - int8 'w_q' with calibrated x_scale/y_scale: CHAIN mode — int8 in,
      int8 out, f32 epilogue fused by XLA (ops/quantization.chained_conv)
    """

    from megadetector_tpu.ops import quantization as q

    if 'w_q' in p:
        assert groups == 1, 'depthwise convs are never quantized'
        k = p['w_q'].shape[0]
        if 'y_scale' in p:
            return q.chained_conv(p, x, stride, k // 2, act=act)
        x = q.qt_dequant(x, dtype) if isinstance(x, q.QTensor) else x
        if q._CALIBRATION_COLLECTOR is not None:
            q._CALIBRATION_COLLECTOR.append(
                (id(p), 'in',
                 jnp.max(jnp.abs(x.astype(jnp.float32)))))
        y = q.quantized_conv(p, x, stride, k // 2, act=act,
                             accum_dtype=dtype or x.dtype)
        if q._CALIBRATION_COLLECTOR is not None:
            q._CALIBRATION_COLLECTOR.append(
                (id(p), 'out',
                 jnp.max(jnp.abs(y.astype(jnp.float32)))))
        return y

    if isinstance(x, q.QTensor):
        x = q.qt_dequant(x, dtype or jnp.float32)
    w = p['w']
    b = p['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups)
    y = y + b
    if act:
        y = y * jax.nn.sigmoid(y)  # SiLU
    return y


def _residual_add(proj_params, y, shortcut, dtype=None):
    """
    Residual add around a block, int8-chain-aware.

    In CHAIN mode the project conv emits a QTensor; the sum is computed
    in f32 (the dequants fuse into the add) and re-quantized at the
    block's calibrated 'res_scale' — quantizing the SUM at its own
    observed absmax rather than the qt_add bound (s_a + s_b), which
    would compound ~linearly over V2-M's 14-18-block residual chains.
    Without a res_scale (uncalibrated / float-policy blocks) the sum
    stays float. During calibration the float sum's absmax is recorded
    against the project node under the 'res' key
    (ops/quantization.calibrate_chain_scales bakes it).
    """

    from megadetector_tpu.ops import quantization as q

    if isinstance(y, q.QTensor) or isinstance(shortcut, q.QTensor):
        s = q.qt_dequant(y, jnp.float32) + \
            q.qt_dequant(shortcut, jnp.float32)
        if isinstance(proj_params, dict) and 'res_scale' in proj_params:
            return q.qt_quantize(s, float(proj_params['res_scale']))
        return s.astype(dtype) if dtype is not None else s

    s = y + shortcut
    if q._CALIBRATION_COLLECTOR is not None and 'w_q' in proj_params:
        q._CALIBRATION_COLLECTOR.append(
            (id(proj_params), 'res',
             jnp.max(jnp.abs(s.astype(jnp.float32)))))
    return s


def _se(block_params, x, dtype=None):
    """Squeeze-and-excitation over NHWC."""

    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = _conv(block_params['se_reduce'], s, act=True, dtype=dtype)
    s = _conv(block_params['se_expand'], s, act=False, dtype=dtype)
    return x * jax.nn.sigmoid(s)


def apply(config, params, x, dtype=None):
    """
    Run the classifier.

    Args:
        config: EfficientNetConfig
        params: parameter pytree
        x: [B, H, W, 3] float images (normalized by the caller)
        dtype: compute dtype

    Returns:
        [B, num_classes] logits (float32)
    """

    if dtype is not None:
        x = x.astype(dtype)

    x = _stem_conv(params['stem'], x, dtype=dtype)

    c_in = config.stem_channels
    for i_stage, (block, expansion, k, stride, c_out, layers) in \
            enumerate(config.stages):
        stage_params = params['stage{}'.format(i_stage)]
        for i_layer in range(layers):
            bp = stage_params['b{}'.format(i_layer)]
            s = stride if i_layer == 0 else 1
            shortcut = x
            use_residual = (s == 1 and c_in == c_out)

            if block == 'fused':
                if expansion == 1:
                    y = _conv(bp['project'], x, stride=s, dtype=dtype)
                else:
                    y = _conv(bp['expand'], x, stride=s, dtype=dtype)
                    y = _conv(bp['project'], y, act=False, dtype=dtype)
            else:
                y = _conv(bp['expand'], x, dtype=dtype)
                c_exp = y.shape[-1]
                y = _conv(bp['dw'], y, stride=s, groups=c_exp, dtype=dtype)
                y = _se(bp, y, dtype=dtype)
                y = _conv(bp['project'], y, act=False, dtype=dtype)

            if use_residual:
                y = _residual_add(bp['project'], y, shortcut, dtype=dtype)
            x = y
            c_in = c_out

    x = _conv(params['head'], x, dtype=dtype)
    from megadetector_tpu.ops.quantization import QTensor, qt_dequant
    if isinstance(x, QTensor):
        x = qt_dequant(x, jnp.float32)
    x = jnp.mean(x, axis=(1, 2))

    w = params['fc']['w']
    b = params['fc']['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    logits = jnp.dot(x, w, preferred_element_type=jnp.float32) + \
        b.astype(jnp.float32)
    return logits


def num_params(params):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


#%% int8 chain quantization
#
# The detector's chained-int8 design (ops/quantization.py) applied to
# the classifier: MBConv/FusedMBConv expand+project convs and the head
# run int8 x int8 -> int32 on the MXU with f32 epilogues fused by XLA,
# and the inter-block residual stream is stored int8 (half the HBM
# bytes). Depthwise convs (VPU-bound, ~2% of FLOPs), SE (tiny), the
# stem (3-lane contraction; also carries the width-fold rewrite), and
# the fc stay float. Hardware profile motivating this:
# experiments/exp_clf_profile.py — the fused stages run at the bf16
# compute ceiling (int8's dot ceiling is ~1.75x higher) and the MBConv
# 1x1s are HBM-bound at the e6 expansion shapes (int8 halves the
# residual/input traffic).


def quantize_params_chain(params, config, float_stages=('stage0',)):
    """
    Quantize an EfficientNetV2 param pytree for CHAIN mode: expand /
    project / head conv nodes get int8 weights (per-output-channel
    symmetric, ops/quantization.quantize_conv_weight) wrapped in
    QConvParams; activation scales (x_scale/y_scale/res_scale) are
    baked afterwards by ops/quantization.calibrate_chain_scales run
    over this module's apply().

    Args:
        params: float param pytree (fold_stem before quantizing —
            the stem stays float either way)
        config: EfficientNetConfig
        float_stages: stage names kept entirely float (default: the
            low-channel high-resolution stage0, mirroring the
            detector's float-store policy for <=128-lane layers)

    Returns:
        a new pytree sharing the float nodes.
    """

    from megadetector_tpu.ops import quantization as q

    def quantize_node(node):
        w_q, scale = q.quantize_conv_weight(np.asarray(node['w']))
        return q.QConvParams(w_q=w_q, w_scale=scale,
                             b=np.asarray(node['b'], np.float32))

    out = {'stem': params['stem']}
    for i_stage in range(len(config.stages)):
        name = 'stage{}'.format(i_stage)
        if name in (float_stages or ()):
            out[name] = params[name]
            continue
        stage_out = {}
        for key, bp in params[name].items():
            nbp = {}
            for slot, node in bp.items():
                if slot in ('expand', 'project'):
                    nbp[slot] = quantize_node(node)
                else:
                    nbp[slot] = node
            stage_out[key] = nbp
        out[name] = stage_out
    out['head'] = quantize_node(params['head'])
    out['fc'] = params['fc']
    return out


def params_are_chain_quantized(params):
    """True when the pytree carries int8 chain conv nodes."""

    found = []

    def walk(node):
        if isinstance(node, dict):
            if 'w_q' in node:
                found.append(node)
            else:
                for v in node.values():
                    walk(v)
    walk(params)
    return len(found) > 0


#%% Conversion from torchvision checkpoints


def convert_torchvision_state_dict(state_dict, config):
    """
    Convert a torchvision efficientnet_v2_* state dict to this module's
    param pytree by ordered consumption: torchvision enumerates conv/BN
    pairs in exactly the construction order used here, so we fold each BN
    into its conv and fill our slots in order. The final linear layer maps
    to 'fc'.
    """

    from megadetector_tpu.models.convert_weights import fuse_conv_bn

    # Ordered (conv_weight, bn or bias) pairs from the state dict
    keys = list(state_dict.keys())
    conv_entries = []
    i = 0
    fc_w = None
    fc_b = None
    while i < len(keys):
        k = keys[i]
        if k.endswith('.weight') and state_dict[k].ndim == 4:
            conv_w = state_dict[k]
            # Look ahead for BN (weight/bias/mean/var) on the same block
            if i + 4 < len(keys) and keys[i + 1].endswith('.weight') and \
                    state_dict[keys[i + 1]].ndim == 1 and \
                    'running_mean' in keys[i + 3]:
                bn_w = state_dict[keys[i + 1]]
                bn_b = state_dict[keys[i + 2]]
                bn_m = state_dict[keys[i + 3]]
                bn_v = state_dict[keys[i + 4]]
                w, b = fuse_conv_bn(np.asarray(conv_w, np.float64),
                                    np.asarray(bn_w, np.float64),
                                    np.asarray(bn_b, np.float64),
                                    np.asarray(bn_m, np.float64),
                                    np.asarray(bn_v, np.float64),
                                    eps=1e-3)
                conv_entries.append((w.astype(np.float32),
                                     b.astype(np.float32)))
                i += 5
                if i < len(keys) and 'num_batches_tracked' in keys[i]:
                    i += 1
                continue
            # Conv with plain bias (SE layers)
            if i + 1 < len(keys) and keys[i + 1].endswith('.bias'):
                conv_entries.append(
                    (np.asarray(conv_w, np.float32),
                     np.asarray(state_dict[keys[i + 1]], np.float32)))
                i += 2
                continue
            conv_entries.append(
                (np.asarray(conv_w, np.float32),
                 np.zeros(conv_w.shape[0], np.float32)))
            i += 1
        elif k.endswith('.weight') and state_dict[k].ndim == 2:
            fc_w = np.asarray(state_dict[k], np.float32)
            if i + 1 < len(keys) and keys[i + 1].endswith('.bias'):
                fc_b = np.asarray(state_dict[keys[i + 1]], np.float32)
                i += 2
            else:
                fc_b = np.zeros(fc_w.shape[0], np.float32)
                i += 1
        else:
            i += 1

    assert fc_w is not None, 'No linear classifier found in state dict'

    def oihw_to_hwio(w):
        return np.transpose(w, (2, 3, 1, 0))

    entries = iter(conv_entries)

    def next_conv(depthwise_channels=None):
        w, b = next(entries)
        if depthwise_channels is not None:
            # torch depthwise: [C, 1, k, k] -> HWIO [k, k, 1, C]
            w = np.transpose(w, (2, 3, 1, 0))
        else:
            w = oihw_to_hwio(w)
        return {'w': w, 'b': b}

    params = {'stem': next_conv()}
    c_in = config.stem_channels
    for i_stage, (block, expansion, k, stride, c_out, layers) in \
            enumerate(config.stages):
        stage_params = {}
        for i_layer in range(layers):
            bp = {}
            if block == 'fused':
                if expansion == 1:
                    bp['project'] = next_conv()
                else:
                    bp['expand'] = next_conv()
                    bp['project'] = next_conv()
            else:
                bp['expand'] = next_conv()
                bp['dw'] = next_conv(depthwise_channels=True)
                bp['se_reduce'] = next_conv()
                bp['se_expand'] = next_conv()
                bp['project'] = next_conv()
            stage_params['b{}'.format(i_layer)] = bp
            c_in = c_out
        params['stage{}'.format(i_stage)] = stage_params

    params['head'] = next_conv()
    remaining = sum(1 for _ in entries)
    assert remaining == 0, \
        '{} unconsumed conv tensors in state dict'.format(remaining)

    params['fc'] = {'w': fc_w.T.copy(), 'b': fc_b}
    return params
