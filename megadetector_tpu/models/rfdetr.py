"""
RF-DETR detection network, TPU-native.

The reference's second model family loads Roboflow RF-DETR `.pth`
checkpoints through the rfdetr pip package
(megadetector/detection/rfdetr_detector.py:34-141). RF-DETR is an
LW-DETR-style architecture:

- Backbone: DINOv2 ViT **with register tokens** and **windowed
  attention** (most blocks attend within non-overlapping spatial
  windows; a few blocks are global), multi-level features taken from
  selected block indexes.
- Projector: selected ViT feature maps are layer-normed, concatenated,
  and projected by convs into a small multi-scale pyramid at the
  transformer hidden size.
- Decoder-only transformer ("encoder-free"): two-stage proposals — a
  linear scorer over projector tokens picks the top-Q tokens, whose
  regressed boxes become the initial reference boxes and whose
  projected features become the query contents — followed by decoder
  layers of query self-attention + **multi-scale deformable
  cross-attention** (learned per-query sampling offsets, bilinear
  sampling of the value pyramid) with **iterative box refinement**.
- Heads: linear class logits (sigmoid, no objectness) + 3-layer MLP box
  deltas in inverse-sigmoid space.

Everything is functional JAX over NHWC/token tensors with static
shapes: the window partition, deformable sampling (vectorized bilinear
gather), and top-Q selection all compile to fixed-shape XLA programs —
the batch-static behavior the reference gets from torch.jit.trace
(rfdetr_detector.py:231-337) falls out naturally.

apply() emits the shared decoded layout [B, Q, 5+nc] (obj = 1, sigmoid
class scores, boxes in canvas pixels) so the TPUDetector postprocess
path is model-agnostic.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


#%% Config

PRESETS = {
    # name: (vit_dim, vit_depth, vit_heads, patch, num_windows,
    #        out_block_indexes, hidden_dim, dec_layers, dec_heads,
    #        num_queries, num_levels, num_points)
    'rfdetr_nano':   (384, 12, 6, 14, 4, (2, 5, 8, 11), 256, 2, 8,
                      300, 2, 4),
    'rfdetr_small':  (384, 12, 6, 14, 4, (2, 5, 8, 11), 256, 3, 8,
                      300, 2, 4),
    'rfdetr_medium': (384, 12, 6, 14, 4, (2, 5, 8, 11), 384, 4, 8,
                      300, 2, 4),
    'rfdetr_base':   (768, 12, 12, 14, 4, (2, 5, 8, 11), 256, 3, 8,
                      300, 2, 4),
    'rfdetr_large':  (1024, 24, 16, 14, 4, (4, 11, 17, 23), 384, 6, 8,
                      300, 2, 4),
    # Tiny test-only variant
    'rfdetr_test':   (64, 4, 4, 14, 2, (1, 3), 64, 2, 4, 50, 2, 4),
}


class RFDetrConfig:
    """Resolved RF-DETR architecture."""

    def __init__(self, arch='rfdetr_base', num_classes=3,
                 image_size=560, num_registers=4):
        assert arch in PRESETS, 'Unknown rfdetr arch {}'.format(arch)
        (self.vit_dim, self.vit_depth, self.vit_heads, self.patch,
         self.num_windows, self.out_block_indexes, self.hidden_dim,
         self.dec_layers, self.dec_heads, self.num_queries,
         self.num_levels, self.num_points) = PRESETS[arch]
        self.arch = arch
        self.num_classes = num_classes
        self.num_registers = num_registers
        self.image_size = image_size
        self.mlp_ratio = 4
        # Global-attention blocks: the feature-output blocks
        self.global_block_indexes = set(self.out_block_indexes)
        # Input resolution must tile into patch * num_windows
        self.size_multiple = self.patch * self.num_windows
        # MD-style interface parity with YoloV5Config
        self.max_stride = self.size_multiple
        self.strides = tuple(self.patch * (2 ** i)
                             for i in range(self.num_levels))

    @property
    def num_outputs(self):
        return self.num_classes + 5


#%% Init

def _linear(rng, d_in, d_out, zero=False, std=None):
    if zero:
        w = np.zeros((d_in, d_out), np.float32)
    else:
        s = std if std is not None else math.sqrt(2.0 / (d_in + d_out))
        w = rng.standard_normal((d_in, d_out)).astype(np.float32) * s
    return {'w': w, 'b': np.zeros((d_out,), np.float32)}


def _ln_params(d):
    return {'g': np.ones((d,), np.float32),
            'b': np.zeros((d,), np.float32)}


def _vit_block(rng, dim, heads):
    return {
        'norm1': _ln_params(dim),
        'qkv': _linear(rng, dim, 3 * dim),
        'proj': _linear(rng, dim, dim),
        'ls1': {'g': np.full((dim,), 1e-5, np.float32)},
        'norm2': _ln_params(dim),
        'fc1': _linear(rng, dim, 4 * dim),
        'fc2': _linear(rng, 4 * dim, dim),
        'ls2': {'g': np.full((dim,), 1e-5, np.float32)},
    }


def _dec_layer(rng, c):
    d = c.hidden_dim
    return {
        'self_qkv': _linear(rng, d, 3 * d),
        'self_proj': _linear(rng, d, d),
        'norm1': _ln_params(d),
        'sampling_offsets': _linear(
            rng, d, c.dec_heads * c.num_levels * c.num_points * 2,
            zero=True),
        'attention_weights': _linear(
            rng, d, c.dec_heads * c.num_levels * c.num_points,
            zero=True),
        'value_proj': _linear(rng, d, d),
        'output_proj': _linear(rng, d, d),
        'norm2': _ln_params(d),
        'linear1': _linear(rng, d, 4 * d),
        'linear2': _linear(rng, 4 * d, d),
        'norm3': _ln_params(d),
    }


def init_params(config, seed=0):
    """Random parameters (tests / benchmarks)."""

    c = config
    rng = np.random.RandomState(seed)
    grid = c.image_size // c.patch

    params = {
        'patch_embed': {
            'w': rng.standard_normal(
                (c.patch, c.patch, 3, c.vit_dim)).astype(np.float32)
            * math.sqrt(2.0 / (c.patch * c.patch * 3)),
            'b': np.zeros((c.vit_dim,), np.float32),
        },
        'cls_token': np.zeros((1, 1, c.vit_dim), np.float32),
        'register_tokens': np.zeros(
            (1, c.num_registers, c.vit_dim), np.float32),
        'pos_embed': (rng.standard_normal(
            (1, grid * grid + 1, c.vit_dim)) * 0.02).astype(np.float32),
        'blocks': {'b{}'.format(i): _vit_block(rng, c.vit_dim,
                                               c.vit_heads)
                   for i in range(c.vit_depth)},
        'out_norms': {'n{}'.format(i): _ln_params(c.vit_dim)
                      for i in range(len(c.out_block_indexes))},
        # Projector: concat(selected) -> hidden at /patch scale, then a
        # stride-2 conv per extra level
        'projector': {
            'conv1': {
                'w': rng.standard_normal(
                    (3, 3, c.vit_dim * len(c.out_block_indexes),
                     c.hidden_dim)).astype(np.float32) * 0.02,
                'b': np.zeros((c.hidden_dim,), np.float32)},
            'norm1': _ln_params(c.hidden_dim),
            'downs': {
                'd{}'.format(i): {'w': rng.standard_normal(
                    (3, 3, c.hidden_dim, c.hidden_dim))
                    .astype(np.float32) * 0.02,
                    'b': np.zeros((c.hidden_dim,), np.float32)}
                for i in range(c.num_levels - 1)},
            'down_norms': {'n{}'.format(i): _ln_params(c.hidden_dim)
                           for i in range(c.num_levels - 1)},
        },
        'level_embed': (rng.standard_normal(
            (c.num_levels, c.hidden_dim)) * 0.02).astype(np.float32),
        # Two-stage proposal heads
        'enc_output': _linear(rng, c.hidden_dim, c.hidden_dim),
        'enc_output_norm': _ln_params(c.hidden_dim),
        'enc_out_class_embed': _linear(rng, c.hidden_dim,
                                       c.num_classes),
        'enc_out_bbox_embed': {
            'l0': _linear(rng, c.hidden_dim, c.hidden_dim),
            'l1': _linear(rng, c.hidden_dim, c.hidden_dim),
            'l2': _linear(rng, c.hidden_dim, 4, zero=True),
        },
        'ref_point_head': {
            'l0': _linear(rng, 2 * c.hidden_dim, c.hidden_dim),
            'l1': _linear(rng, c.hidden_dim, c.hidden_dim),
        },
        'decoder': {'d{}'.format(i): _dec_layer(rng, c)
                    for i in range(c.dec_layers)},
        'decoder_norm': _ln_params(c.hidden_dim),
        'class_embed': _linear(rng, c.hidden_dim, c.num_classes),
        'bbox_embed': {
            'l0': _linear(rng, c.hidden_dim, c.hidden_dim),
            'l1': _linear(rng, c.hidden_dim, c.hidden_dim),
            'l2': _linear(rng, c.hidden_dim, 4, zero=True),
        },
    }

    # Deformable-DETR offset init: per-head directional bias
    for layer in params['decoder'].values():
        h = c.dec_heads
        thetas = np.arange(h, dtype=np.float32) * (2 * np.pi / h)
        grid_init = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid_init /= np.abs(grid_init).max(-1, keepdims=True)
        grid_init = np.tile(grid_init[:, None, None, :],
                            (1, c.num_levels, c.num_points, 1))
        for p in range(c.num_points):
            grid_init[:, :, p, :] *= (p + 1)
        layer['sampling_offsets']['b'] = grid_init.reshape(-1) \
            .astype(np.float32)
    return params


#%% Primitives

def _ln(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p['g'] + p['b']


def _dense(p, x):
    return x @ jnp.asarray(p['w'], x.dtype) + jnp.asarray(p['b'],
                                                          x.dtype)


def _mha(q, k, v, heads):
    """Standard multi-head attention over [..., N, D] tokens."""

    *lead, n, d = q.shape
    hd = d // heads

    def split(x):
        return x.reshape(*lead, x.shape[-2], heads, hd) \
            .swapaxes(-2, -3)  # [..., heads, N, hd]

    qh, kh, vh = split(q), split(k), split(v)
    logits = (qh @ kh.swapaxes(-1, -2)) / math.sqrt(hd)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) \
        .astype(q.dtype)
    out = attn @ vh
    return out.swapaxes(-2, -3).reshape(*lead, n, d)


def _vit_block_apply(p, x, heads, windowed, num_windows, grid_hw,
                     n_prefix):
    """
    One DINOv2 block with LayerScale. When [windowed], the patch tokens
    attend within num_windows x num_windows spatial windows (prefix
    cls/register tokens join every window, mirroring the
    windowed-with-registers design); global blocks attend over all
    tokens.
    """

    b, n, d = x.shape
    h, w = grid_hw

    def attn(tokens):
        y = _ln(p['norm1'], tokens)
        qkv = _dense(p['qkv'], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = _mha(q, k, v, heads)
        y = _dense(p['proj'], y)
        return tokens + y * p['ls1']['g'].astype(y.dtype)

    if not windowed or num_windows <= 1:
        x = attn(x)
    else:
        nw = num_windows
        wh, ww = h // nw, w // nw
        prefix = x[:, :n_prefix]                       # [B, P, D]
        patches = x[:, n_prefix:].reshape(b, h, w, d)
        win = patches.reshape(b, nw, wh, nw, ww, d) \
            .transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b * nw * nw, wh * ww, d)
        pre = jnp.repeat(prefix, nw * nw, axis=0)      # [B*nw2, P, D]
        tokens = jnp.concatenate([pre, win], axis=1)
        tokens = attn(tokens)
        pre2 = tokens[:, :n_prefix].reshape(b, nw * nw, n_prefix, d) \
            .mean(axis=1)
        win2 = tokens[:, n_prefix:] \
            .reshape(b, nw, nw, wh, ww, d) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h * w, d)
        x = jnp.concatenate([pre2, win2], axis=1)

    y = _ln(p['norm2'], x)
    y = _dense(p['fc2'], jax.nn.gelu(_dense(p['fc1'], y), approximate=False))
    return x + y * p['ls2']['g'].astype(y.dtype)


def _mlp3(p, x):
    """3-layer box-embed MLP (ReLU, final linear)."""

    x = jax.nn.relu(_dense(p['l0'], x))
    x = jax.nn.relu(_dense(p['l1'], x))
    return _dense(p['l2'], x)


def _sine_embed_2d(xy, dim, temperature=10000.0):
    """Sine position encoding of normalized (x, y): [..., 2] -> [..., 2*dim]."""

    scale = 2 * math.pi
    dim_t = jnp.arange(dim // 2, dtype=jnp.float32)
    dim_t = temperature ** (2 * dim_t / (dim // 2) / 2.0)
    out = []
    for i in range(2):
        v = xy[..., i:i + 1].astype(jnp.float32) * scale / dim_t
        out.append(jnp.stack([jnp.sin(v), jnp.cos(v)], axis=-1)
                   .reshape(*xy.shape[:-1], -1))
    return jnp.concatenate(out[::-1], axis=-1)  # (y, x) order


def _deformable_attn(p, queries, ref_boxes, value_levels, level_shapes,
                     heads, num_points, dtype):
    """
    Multi-scale deformable cross-attention (Deformable-DETR semantics).

    queries: [B, Q, D]; ref_boxes: [B, Q, 4] normalized cxcywh;
    value_levels: list of [B, H_l*W_l, D] per level.
    """

    b, nq, d = queries.shape
    nl = len(value_levels)
    hd = d // heads

    value = jnp.concatenate(value_levels, axis=1)       # [B, S, D]
    value = _dense(p['value_proj'], value)
    s_total = value.shape[1]
    value = value.reshape(b, s_total, heads, hd)

    offsets = _dense(p['sampling_offsets'], queries).astype(jnp.float32)
    offsets = offsets.reshape(b, nq, heads, nl, num_points, 2)
    weights = _dense(p['attention_weights'], queries).astype(jnp.float32)
    weights = weights.reshape(b, nq, heads, nl * num_points)
    weights = jax.nn.softmax(weights, axis=-1) \
        .reshape(b, nq, heads, nl, num_points)

    ref_xy = ref_boxes[..., :2].astype(jnp.float32)
    ref_wh = ref_boxes[..., 2:].astype(jnp.float32)
    # sampling_locations normalized to [0, 1]
    loc = ref_xy[:, :, None, None, None, :] + \
        offsets / num_points * ref_wh[:, :, None, None, None, :] * 0.5

    outputs = jnp.zeros((b, nq, heads, hd), jnp.float32)
    start = 0
    for lvl in range(nl):
        h_l, w_l = level_shapes[lvl]
        n_l = h_l * w_l
        v_l = value[:, start:start + n_l]               # [B,n,heads,hd]
        start += n_l

        xy = loc[:, :, :, lvl]                          # [B,Q,h,P,2]
        x = xy[..., 0] * w_l - 0.5
        y = xy[..., 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        head_idx = jnp.arange(heads, dtype=jnp.int32)[None, None, :,
                                                      None]

        def gather(ix, iy):
            inside = ((ix >= 0) & (ix < w_l) &
                      (iy >= 0) & (iy < h_l))
            ixc = jnp.clip(ix, 0, w_l - 1).astype(jnp.int32)
            iyc = jnp.clip(iy, 0, h_l - 1).astype(jnp.int32)
            # Flat index over (position, head) so each head gathers
            # only its own hd-slice
            flat = (iyc * w_l + ixc) * heads + head_idx  # [B,Q,h,P]
            flat2 = flat.reshape(b, -1)                  # [B, Q*h*P]
            g = jnp.take_along_axis(
                v_l.reshape(b, n_l * heads, hd),
                flat2[..., None], axis=1)                # [B,Q*h*P,hd]
            g = g.reshape(b, nq, heads, num_points, hd)
            return g.astype(jnp.float32) * \
                inside[..., None].astype(jnp.float32)

        g00 = gather(x0, y0)
        g01 = gather(x0 + 1, y0)
        g10 = gather(x0, y0 + 1)
        g11 = gather(x0 + 1, y0 + 1)
        fx = fx[..., None]
        fy = fy[..., None]
        sampled = (g00 * (1 - fx) * (1 - fy) + g01 * fx * (1 - fy) +
                   g10 * (1 - fx) * fy + g11 * fx * fy)  # [B,Q,h,P,hd]
        outputs = outputs + jnp.sum(
            sampled * weights[:, :, :, lvl, :, None], axis=3)

    out = outputs.reshape(b, nq, d).astype(dtype)
    return _dense(p['output_proj'], out)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


#%% Forward

def backbone_features(config, params, x, dtype):
    """ViT backbone -> list of [B, H, W, vit_dim] selected features."""

    c = config
    b, hh, ww, _ = x.shape
    assert hh % c.size_multiple == 0 and ww % c.size_multiple == 0, \
        'Input must be a multiple of {}'.format(c.size_multiple)
    gh, gw = hh // c.patch, ww // c.patch

    w = jnp.asarray(params['patch_embed']['w'], dtype)
    tokens = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (c.patch, c.patch), [(0, 0), (0, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    tokens = tokens + jnp.asarray(params['patch_embed']['b'], dtype)
    tokens = tokens.reshape(b, gh * gw, c.vit_dim)

    # Interpolate the (square-grid) pos embed to the patch grid
    pos = jnp.asarray(params['pos_embed'], jnp.float32)
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    side = int(math.sqrt(patch_pos.shape[1]))
    patch_pos = patch_pos.reshape(1, side, side, c.vit_dim)
    patch_pos = jax.image.resize(
        patch_pos, (1, gh, gw, c.vit_dim), method='bilinear')
    patch_pos = patch_pos.reshape(1, gh * gw, c.vit_dim)

    tokens = tokens + patch_pos.astype(dtype)
    cls_tok = (jnp.asarray(params['cls_token'], jnp.float32) +
               cls_pos).astype(dtype)
    cls_tok = jnp.broadcast_to(cls_tok, (b, 1, c.vit_dim))
    regs = jnp.broadcast_to(
        jnp.asarray(params['register_tokens'], dtype),
        (b, c.num_registers, c.vit_dim))
    n_prefix = 1 + c.num_registers
    xx = jnp.concatenate([cls_tok, regs, tokens], axis=1)

    feats = []
    for i in range(c.vit_depth):
        blk = params['blocks']['b{}'.format(i)]
        windowed = i not in c.global_block_indexes
        xx = _vit_block_apply(blk, xx, c.vit_heads, windowed,
                              c.num_windows, (gh, gw), n_prefix)
        if i in c.out_block_indexes:
            idx = list(c.out_block_indexes).index(i)
            f = _ln(params['out_norms']['n{}'.format(idx)],
                    xx[:, n_prefix:])
            feats.append(f.reshape(b, gh, gw, c.vit_dim))
    return feats


def apply(config, params, x, dtype=None, decode=True):
    """
    Run RF-DETR.

    Args:
        config: RFDetrConfig
        params: pytree from init_params / the weight converter
        x: [B, H, W, 3] float images in [0, 1]
        decode: when True return [B, Q, 5+nc] (obj=1, sigmoid class
            scores, cxcywh boxes in canvas pixels); else
            (class_logits [B, Q, nc], boxes_norm [B, Q, 4])

    Returns:
        decoded predictions or (logits, boxes)
    """

    c = config
    if dtype is None:
        dtype = x.dtype
    b, hh, ww, _ = x.shape

    feats = backbone_features(config, params, x, dtype)

    # Projector: concat levels -> conv -> pyramid
    cat = jnp.concatenate(feats, axis=-1)
    pj = params['projector']
    f = jax.lax.conv_general_dilated(
        cat, jnp.asarray(pj['conv1']['w'], dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    f = f + jnp.asarray(pj['conv1']['b'], dtype)
    f = jax.nn.gelu(_ln(pj['norm1'], f), approximate=False)

    levels = [f]
    for di in range(c.num_levels - 1):
        down = pj['downs']['d{}'.format(di)]
        dnorm = pj['down_norms']['n{}'.format(di)]
        g = jax.lax.conv_general_dilated(
            levels[-1], jnp.asarray(down['w'], dtype), (2, 2),
            [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        g = g + jnp.asarray(down['b'], dtype)
        levels.append(jax.nn.gelu(_ln(dnorm, g), approximate=False))

    level_shapes = [(lv.shape[1], lv.shape[2]) for lv in levels]
    tokens = []
    centers = []
    scales = []
    for lvl, lv in enumerate(levels):
        h_l, w_l = level_shapes[lvl]
        t = lv.reshape(b, h_l * w_l, c.hidden_dim)
        t = t + jnp.asarray(params['level_embed'][lvl], dtype)
        tokens.append(t)
        ys = (jnp.arange(h_l, dtype=jnp.float32) + 0.5) / h_l
        xs = (jnp.arange(w_l, dtype=jnp.float32) + 0.5) / w_l
        cx, cy = jnp.meshgrid(xs, ys)
        centers.append(jnp.stack([cx.ravel(), cy.ravel()], axis=-1))
        scales.append(jnp.full((h_l * w_l, 2), 0.1 * (2 ** lvl),
                               jnp.float32))
    memory = jnp.concatenate(tokens, axis=1)            # [B, S, D]
    anchors_xy = jnp.concatenate(centers, axis=0)       # [S, 2]
    anchors_wh = jnp.concatenate(scales, axis=0)        # [S, 2]

    # Two-stage proposals: score every memory token, take the top Q
    enc = _dense(params['enc_output'], memory)
    enc = _ln(params['enc_output_norm'], enc)
    enc_logits = _dense(params['enc_out_class_embed'], enc)
    enc_score = jnp.max(enc_logits.astype(jnp.float32), axis=-1)
    _, top_idx = jax.lax.top_k(enc_score, c.num_queries)  # [B, Q]

    def take(arr, idx):
        return jnp.take_along_axis(arr, idx[..., None], axis=1)

    q_content = take(enc, top_idx)                      # [B, Q, D]
    anchor_xy = jnp.take(anchors_xy, top_idx, axis=0)   # [B, Q, 2]
    anchor_wh = jnp.take(anchors_wh, top_idx, axis=0)
    anchor_box = jnp.concatenate([anchor_xy, anchor_wh], axis=-1)
    delta = _mlp3(params['enc_out_bbox_embed'],
                  q_content).astype(jnp.float32)
    ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(anchor_box) + delta)

    queries = q_content
    for li in range(c.dec_layers):
        layer = params['decoder']['d{}'.format(li)]
        # Query pos from reference box centers
        qpos = _sine_embed_2d(ref_boxes[..., :2], c.hidden_dim)
        qpos = _dense(params['ref_point_head']['l1'],
                      jax.nn.relu(_dense(params['ref_point_head']['l0'],
                                         qpos.astype(dtype))))
        qc = queries + qpos
        y = _dense(layer['self_qkv'], qc)
        q_, k_, v_ = jnp.split(y, 3, axis=-1)
        sa = _mha(q_, k_, v_, c.dec_heads)
        queries = _ln(layer['norm1'],
                      queries + _dense(layer['self_proj'], sa))

        ca = _deformable_attn(layer, queries + qpos, ref_boxes, tokens,
                              level_shapes, c.dec_heads, c.num_points,
                              dtype)
        queries = _ln(layer['norm2'], queries + ca)

        ff = _dense(layer['linear2'],
                    jax.nn.relu(_dense(layer['linear1'], queries)))
        queries = _ln(layer['norm3'], queries + ff)

        # Iterative refinement
        delta = _mlp3(params['bbox_embed'], queries).astype(jnp.float32)
        ref_boxes = jax.nn.sigmoid(_inverse_sigmoid(ref_boxes) + delta)

    queries = _ln(params['decoder_norm'], queries)
    class_logits = _dense(params['class_embed'], queries)

    if not decode:
        return class_logits, ref_boxes

    cls = jax.nn.sigmoid(class_logits.astype(jnp.float32))
    cx = ref_boxes[..., 0] * ww
    cy = ref_boxes[..., 1] * hh
    bw = ref_boxes[..., 2] * ww
    bh = ref_boxes[..., 3] * hh
    obj = jnp.ones_like(cx)
    return jnp.concatenate(
        [jnp.stack([cx, cy, bw, bh, obj], axis=-1), cls], axis=-1)


def num_params(params):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
