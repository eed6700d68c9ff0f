"""
Where do the 2.2 ms/img go? Per-segment cost of the PRODUCTION int8
chain at the 960x1280 rect canvas: truncated programs at cut layers,
consecutive diffs = segment cost, each annotated with its analytic MAC
count -> achieved TOP/s. Plus the post-forward stages (candidate
selection, NMS) and the u8 normalize.

The v5e chip sustains 284 TOP/s on 8192^3 int8 dots and 202.5 through a
Pallas fused mm at conv-shaped K (exp_pallas_int8_matmul); segments far
below that line are engineering targets, segments at it are physics.

Run alone (one TPU process at a time). Self-exits via watchdog.
"""

import os
import sys
import threading
import time

# On the 1-core measurement host, OpenMP and XLA thread pools deadlock
# in futex waits without this (same pin as tests/conftest.py)
os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '3300')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get('EXP_CPU'):
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import quantization as q
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
CANVAS_H = int(os.environ.get('EXP_H', '960'))
CANVAS_W = int(os.environ.get('EXP_W', '1280'))
N = int(os.environ.get('EXP_N', '6'))
CUTS = [int(c) for c in os.environ.get(
    'EXP_CUTS', '1,2,4,6,8,11,15,19,23,26,29,32,33').split(',')]

print('backend:', jax.default_backend(), 'batch', BATCH,
      'canvas {}x{}'.format(CANVAS_H, CANVAS_W), flush=True)

ARCH = os.environ.get('EXP_ARCH', 'yolov5l6')
config = yolov5.YoloV5Config(ARCH, num_classes=3)

# ---- analytic MACs per layer at this canvas ----

def layer_macs(cfg, H, W):
    shapes = {}
    prev = (H, W, 3)
    per_layer = []
    for i, e in enumerate(cfg.layers):
        kind = e['kind']
        frm = e['frm']

        def src(f):
            return prev if f == -1 else shapes[f]

        macs = 0
        if kind == 'conv':
            h, w, c = src(frm)
            s, k, co = e['s'], e['k'], e['c_out']
            oh, ow = h // s, w // s
            macs = oh * ow * c * co * k * k
            out = (oh, ow, co)
        elif kind == 'c3':
            h, w, c = src(frm)
            co, n = e['c_out'], e['n']
            ch = co // 2
            macs = h * w * (c * ch * 2 + n * (ch * ch * 10) + 2 * ch * co)
            out = (h, w, co)
        elif kind == 'sppf':
            h, w, c = src(frm)
            co = e['c_out']
            ch = c // 2
            macs = h * w * (c * ch + 4 * ch * co)
            out = (h, w, co)
        elif kind == 'up':
            h, w, c = src(frm)
            out = (h * 2, w * 2, c)
        elif kind == 'cat':
            ss = [src(f) for f in frm]
            out = (ss[0][0], ss[0][1], sum(s[2] for s in ss))
        elif kind == 'detect':
            for f in frm:
                h, w, c = shapes[f]
                macs += h * w * c * (3 * (5 + cfg.num_classes))
            out = prev
        shapes[i] = out
        prev = out
        per_layer.append(macs)
    return per_layer

MACS = layer_macs(config, CANVAS_H, CANVAS_W)

# ---- production int8-chain params ----

params_f32 = folding.fold_early_params(
    yolov5.init_params(config, seed=0), config)
detect_name = 'l{}'.format(len(config.layers) - 1)
params_int8 = q.quantize_params_chain(
    params_f32, skip_names=(detect_name,),
    float_store_names=q.default_float_store(params_f32))
CALIB = int(os.environ.get('EXP_CALIB', '320'))
calib = np.random.RandomState(1).uniform(
    0, 1, (2, CALIB, CALIB, 3)).astype(np.float32)
q.calibrate_chain_scales(yolov5.apply, config, params_int8, calib)
params_int8 = jax.device_put(params_int8)

rng = np.random.RandomState(0)
images = jax.device_put(rng.randint(
    0, 255, (BATCH, CANVAS_H, CANVAS_W, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))
print('staged', flush=True)


def truncated_apply(cut):
    """The production apply() loop, stopped after layer [cut]; reduces
    to a scalar so output transfer is negligible."""

    def fn(params, images_u8):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        saved = {}
        # apply() casts to the compute dtype at entry (yolov5.py:489)
        prev = x.astype(jnp.bfloat16)
        folded = folding.params_are_folded(params)
        for i, entry in enumerate(config.layers[:cut + 1]):
            kind = entry['kind']
            name = 'l{}'.format(i)
            frm = entry['frm']
            if folded and i < 4:
                src = prev if frm == -1 else saved[frm]
                out = yolov5._apply_folded_layer(
                    i, entry, params[name], src, jnp.bfloat16)
            elif kind == 'conv':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._conv(params[name], src, entry['s'],
                                   jnp.bfloat16, pad=entry['p'])
            elif kind == 'c3':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._c3(params[name], src, entry['n'],
                                 entry['shortcut'], jnp.bfloat16)
            elif kind == 'sppf':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._sppf(params[name], src, entry['pool_k'],
                                   jnp.bfloat16)
            elif kind == 'up':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._upsample2x(src)
            elif kind == 'cat':
                srcs = [prev if f == -1 else saved[f] for f in frm]
                out = q.qt_concat(srcs, axis=-1)
            elif kind == 'detect':
                acc = jnp.float32(0)
                for lvl, f in enumerate(frm):
                    o = yolov5._conv_linear(
                        params[name]['m{}'.format(lvl)], saved[f],
                        jnp.bfloat16)
                    acc = acc + o[0, 0, 0, 0].astype(jnp.float32)
                return acc
            if i in config.save_indices:
                saved[i] = out
            prev = out
        if isinstance(prev, q.QTensor):
            return prev.q[0, 0, 0, 0].astype(jnp.float32)
        return prev[0, 0, 0, 0].astype(jnp.float32)
    return fn


def full_step(with_nms):
    def fn(params, images_u8):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            jnp.float32(0.005), 512)
        if not with_nms:
            return cands['scores'][0, 0]
        out = nms_on_candidates(cands, jnp.float32(0.45), max_det=300)
        return out['scores'][0, 0]
    return fn


def timed(fn_jit, label):
    out = fn_jit(params_int8, images)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [fn_jit(params_int8, images) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    return dt


prev_t = None
prev_cut = None
cum_macs = 0.0
print('{:>12s} {:>9s} {:>10s} {:>9s} {:>9s}'.format(
    'cut', 'total ms', 'seg ms', 'seg GMAC', 'TOP/s'), flush=True)
for cut in CUTS:
    f = jax.jit(truncated_apply(cut))
    dt = timed(f, 'l{}'.format(cut))
    lo = 0 if prev_cut is None else prev_cut + 1
    seg_macs = sum(MACS[lo:cut + 1]) * BATCH
    seg_ms = None if prev_t is None else (dt - prev_t) * 1000
    tops = '' if seg_ms is None or seg_ms <= 0 else \
        '{:9.1f}'.format(2 * seg_macs / (seg_ms / 1000) / 1e12)
    print('{:>12s} {:9.2f} {:>10s} {:9.2f} {:>9s}'.format(
        'l{}..l{}'.format(lo, cut), dt * 1000,
        '' if seg_ms is None else '{:10.2f}'.format(seg_ms),
        seg_macs / 1e9, tops), flush=True)
    prev_t = dt
    prev_cut = cut

t_sel = timed(jax.jit(full_step(False)), 'select')
print('{:>12s} {:9.2f} {:>10s}  (select_topk on top of forward)'.format(
    '+select', t_sel * 1000,
    '{:10.2f}'.format((t_sel - prev_t) * 1000)), flush=True)
t_nms = timed(jax.jit(full_step(True)), 'nms')
print('{:>12s} {:9.2f} {:>10s}  (fixpoint NMS on top)'.format(
    '+nms', t_nms * 1000, '{:10.2f}'.format((t_nms - t_sel) * 1000)),
    flush=True)

total_macs = sum(MACS) * BATCH
print('\nfull step: {:.2f} ms = {:.1f} img/s; {:.1f} GMAC/img; '
      'effective {:.1f} TOP/s'.format(
          t_nms * 1000, BATCH / t_nms, sum(MACS) / 1e9,
          2 * total_macs / t_nms / 1e12), flush=True)
os._exit(0)
