"""
DETR-style detection network (ViT backbone + transformer decoder with
learned object queries), TPU-native.

This fills the reference's RF-DETR model-family slot
(megadetector/detection/rfdetr_detector.py:231-337: DINOv2 backbone +
deformable-attention decoder, loaded via the rfdetr pip package). The
architecture here is the set-prediction design those models share: a
ViT encoder over image patches, 2D sine positional encodings, a decoder
whose learned queries cross-attend to the encoder memory, and per-query
class/box heads. As the reference notes, these models are naturally
batch-static (rfdetr_detector.py pins batch sizes for torch.jit), which
makes them an ideal XLA fit — everything here is one fixed-shape program.

Decode emits the shared [B, Q, 5+nc] layout (obj = 1, sigmoid class
scores, cxcywh in canvas pixels) so the standard NMS/postprocess path
serves all three model families. DETR-style models barely need NMS (set
prediction), which simply means few suppressions happen.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


class DetrConfig:
    """Resolved DETR-style architecture."""

    def __init__(self, arch='detr_small', num_classes=3, image_size=448):
        presets = {
            'detr_small': dict(patch=16, dim=384, depth=12, heads=6,
                               dec_dim=256, dec_depth=3, dec_heads=8,
                               num_queries=300),
            'detr_base': dict(patch=14, dim=768, depth=12, heads=12,
                              dec_dim=256, dec_depth=6, dec_heads=8,
                              num_queries=300),
            'detr_tiny': dict(patch=16, dim=96, depth=2, heads=3,
                              dec_dim=64, dec_depth=2, dec_heads=4,
                              num_queries=32),
        }
        assert arch in presets, 'Unknown arch {}'.format(arch)
        self.arch = arch
        self.num_classes = num_classes
        self.image_size = image_size
        for k, v in presets[arch].items():
            setattr(self, k, v)
        self.mlp_ratio = 4
        # The detector protocol uses this for letterbox stride; ViT needs
        # patch-aligned inputs
        self.max_stride = self.patch


#%% Initialization


def _linear(rng, d_in, d_out, zero=False):
    if zero:
        w = np.zeros((d_in, d_out), np.float32)
    else:
        w = rng.standard_normal((d_in, d_out)).astype(np.float32) * \
            (1.0 / math.sqrt(d_in))
    return {'w': w, 'b': np.zeros((d_out,), np.float32)}


def _layernorm(d):
    return {'g': np.ones((d,), np.float32),
            'b': np.zeros((d,), np.float32)}


def _attn_block(rng, dim, heads):
    return {
        'ln1': _layernorm(dim),
        'qkv': _linear(rng, dim, 3 * dim),
        'proj': _linear(rng, dim, dim),
        'ln2': _layernorm(dim),
        'mlp1': _linear(rng, dim, 4 * dim),
        'mlp2': _linear(rng, 4 * dim, dim),
    }


def _dec_block(rng, dim, heads):
    return {
        'ln1': _layernorm(dim),
        'self_qkv': _linear(rng, dim, 3 * dim),
        'self_proj': _linear(rng, dim, dim),
        'ln2': _layernorm(dim),
        'cross_q': _linear(rng, dim, dim),
        'cross_kv': _linear(rng, dim, 2 * dim),
        'cross_proj': _linear(rng, dim, dim),
        'ln3': _layernorm(dim),
        'mlp1': _linear(rng, dim, 4 * dim),
        'mlp2': _linear(rng, 4 * dim, dim),
    }


def init_params(config, seed=0):
    """Random parameters; structure mirrors apply()."""

    rng = np.random.RandomState(seed)
    c = config
    params = {
        'patch_embed': _linear(rng, c.patch * c.patch * 3, c.dim),
        'enc_ln': _layernorm(c.dim),
        'enc': {'b{}'.format(i): _attn_block(rng, c.dim, c.heads)
                for i in range(c.depth)},
        'input_proj': _linear(rng, c.dim, c.dec_dim),
        'queries': rng.standard_normal(
            (c.num_queries, c.dec_dim)).astype(np.float32) * 0.02,
        'dec': {'b{}'.format(i): _dec_block(rng, c.dec_dim, c.dec_heads)
                for i in range(c.dec_depth)},
        'dec_ln': _layernorm(c.dec_dim),
        'class_head': _linear(rng, c.dec_dim, c.num_classes),
        'box_head1': _linear(rng, c.dec_dim, c.dec_dim),
        'box_head2': _linear(rng, c.dec_dim, 4),
    }
    return params


#%% Forward


def _ln(p, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p['g'] + p['b']


def _dense(p, x, dtype=None):
    w, b = p['w'], p['b']
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def _mha(q, k, v, heads):
    """[B, Nq, D] x [B, Nk, D] -> [B, Nq, D] multi-head attention."""

    b, nq, d = q.shape
    nk = k.shape[1]
    dh = d // heads

    def split(x, n):
        return x.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    qh = split(q, nq)
    kh = split(k, nk)
    vh = split(v, nk)
    scores = jnp.einsum('bhqd,bhkd->bhqk', qh, kh) / math.sqrt(dh)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('bhqk,bhkd->bhqd', attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


def _sine_pos_embed(h, w, dim, dtype):
    """2D sine/cosine positional encoding [h*w, dim]."""

    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000 ** (jnp.arange(quarter, dtype=dtype) / quarter))
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1).reshape(-1)
    out = jnp.concatenate([
        jnp.sin(xs[:, None] * omega), jnp.cos(xs[:, None] * omega),
        jnp.sin(ys[:, None] * omega), jnp.cos(ys[:, None] * omega),
    ], axis=1)
    return out


def apply(config, params, x, dtype=None, decode=True):
    """
    Run the network.

    Args:
        x: [B, H, W, 3] float images in [0, 1]; H, W multiples of the
            patch size
    Returns:
        [B, num_queries, 5+nc] decoded predictions (obj = 1)
    """

    if dtype is None:
        dtype = x.dtype
    x = x.astype(dtype)
    c = config
    b, img_h, img_w, _ = x.shape
    gh, gw = img_h // c.patch, img_w // c.patch

    # Patchify: [B, gh, gw, patch*patch*3]
    patches = x.reshape(b, gh, c.patch, gw, c.patch, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, gh * gw, c.patch * c.patch * 3)

    tokens = _dense(params['patch_embed'], patches, dtype)
    tokens = tokens + _sine_pos_embed(gh, gw, c.dim, dtype)[None]

    for i in range(c.depth):
        blk = params['enc']['b{}'.format(i)]
        h = _ln(blk['ln1'], tokens)
        qkv = _dense(blk['qkv'], h, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tokens = tokens + _dense(blk['proj'], _mha(q, k, v, c.heads),
                                 dtype)
        h = _ln(blk['ln2'], tokens)
        h = jax.nn.gelu(_dense(blk['mlp1'], h, dtype))
        tokens = tokens + _dense(blk['mlp2'], h, dtype)

    memory = _ln(params['enc_ln'], tokens)
    memory = _dense(params['input_proj'], memory, dtype)
    memory = memory + _sine_pos_embed(gh, gw, c.dec_dim, dtype)[None]

    queries = jnp.broadcast_to(
        params['queries'].astype(dtype)[None],
        (b, c.num_queries, c.dec_dim))

    for i in range(c.dec_depth):
        blk = params['dec']['b{}'.format(i)]
        h = _ln(blk['ln1'], queries)
        qkv = _dense(blk['self_qkv'], h, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        queries = queries + _dense(
            blk['self_proj'], _mha(q, k, v, c.dec_heads), dtype)
        h = _ln(blk['ln2'], queries)
        q = _dense(blk['cross_q'], h, dtype)
        kv = _dense(blk['cross_kv'], memory, dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        queries = queries + _dense(
            blk['cross_proj'], _mha(q, k, v, c.dec_heads), dtype)
        h = _ln(blk['ln3'], queries)
        h = jax.nn.gelu(_dense(blk['mlp1'], h, dtype))
        queries = queries + _dense(blk['mlp2'], h, dtype)

    queries = _ln(params['dec_ln'], queries)

    class_logits = _dense(params['class_head'], queries, dtype)
    box_h = jax.nn.relu(_dense(params['box_head1'], queries, dtype))
    box_raw = _dense(params['box_head2'], box_h, dtype)

    if not decode:
        return class_logits, box_raw

    boxes = jax.nn.sigmoid(box_raw.astype(jnp.float32))  # cxcywh in [0,1]
    cls = jax.nn.sigmoid(class_logits.astype(jnp.float32))
    cx = boxes[..., 0] * img_w
    cy = boxes[..., 1] * img_h
    bw = boxes[..., 2] * img_w
    bh = boxes[..., 3] * img_h
    obj = jnp.ones((b, c.num_queries, 1), jnp.float32)
    return jnp.concatenate(
        [cx[..., None], cy[..., None], bw[..., None], bh[..., None],
         obj, cls], axis=-1)


def num_params(params):
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
