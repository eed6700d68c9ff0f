"""
Classifier-stage profile (VERDICT-r4 item 9 follow-through): where do
the ~83 ms of an EfficientNetV2-M 480px bf16 b128 batch go? Truncated
programs cut after the stem and each stage; consecutive diffs =
segment cost, annotated with analytic MACs -> achieved TFLOP/s
(bf16 ceiling on this chip: ~162 TFLOP/s on 8192^3 dots).

The architecture mixes MXU work (fused-MBConv regular convs, MBConv
1x1 expand/project) with VPU-bound depthwise convs and SE gating; this
profile decides whether an int8 classifier chain (detector-style) or a
layout/SE restructuring is the right lever.

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '3000')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get('EXP_CPU'):
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import efficientnet

BATCH = int(os.environ.get('EXP_BATCH', '128'))
SIZE = int(os.environ.get('EXP_SIZE', '480'))
N = int(os.environ.get('EXP_N', '6'))
ARCH = os.environ.get('EXP_ARCH', 'efficientnetv2_m')

print('backend:', jax.default_backend(), 'batch', BATCH,
      '{}px'.format(SIZE), ARCH, flush=True)

config = efficientnet.EfficientNetConfig(ARCH, num_classes=2000)


# ---- analytic MACs per stage at this input size ----

def stage_macs(cfg, size):
    """Returns [('stem', macs), ('stage0', macs), ..., ('head', macs)],
    splitting each MBConv stage into (mxu 1x1s, dw, se) components."""

    h = size // 2  # stem s2
    out = [('stem', h * h * 3 * cfg.stem_channels * 9, {})]
    c_in = cfg.stem_channels
    for i_stage, (block, expansion, k, stride, c_out, layers) in \
            enumerate(cfg.stages):
        total = 0
        parts = {'mxu': 0, 'dw': 0, 'se': 0}
        for i_layer in range(layers):
            s = stride if i_layer == 0 else 1
            oh = h // s
            c_exp = c_in * expansion
            if block == 'fused':
                if expansion == 1:
                    m = oh * oh * c_in * c_out * k * k
                    parts['mxu'] += m
                else:
                    m = (oh * oh * c_in * c_exp * k * k +
                         oh * oh * c_exp * c_out)
                    parts['mxu'] += m
            else:
                c_se = max(1, c_in // 4)
                m_mxu = (h * h * c_in * c_exp +        # expand 1x1
                         oh * oh * c_exp * c_out)      # project 1x1
                m_dw = oh * oh * c_exp * k * k         # depthwise
                m_se = c_exp * c_se * 2                # SE (1x1 on GAP)
                parts['mxu'] += m_mxu
                parts['dw'] += m_dw
                parts['se'] += m_se
                m = m_mxu + m_dw + m_se
            total += m
            h = oh
            c_in = c_out
        out.append(('stage{}'.format(i_stage), total, dict(parts)))
    out.append(('head', h * h * c_in * cfg.head_channels, {}))
    return out


SEGS = stage_macs(config, SIZE)
for name, m, parts in SEGS:
    extra = ''
    if parts:
        extra = '  (mxu {:.1f} dw {:.1f} se {:.3f})'.format(
            parts['mxu'] / 1e9, parts['dw'] / 1e9, parts['se'] / 1e9)
    print('  {:8s} {:8.2f} GMAC{}'.format(name, m / 1e9, extra),
          flush=True)
print('  total    {:8.2f} GMAC/img'.format(
    sum(m for _, m, _ in SEGS) / 1e9), flush=True)

params = jax.device_put(jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16),
    efficientnet.init_params(config, seed=0)))

rng = np.random.RandomState(0)
crops = jax.device_put(rng.randint(
    0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(crops[:1, :1, :1, 0]))
print('staged', flush=True)


def truncated_apply(n_stages):
    """apply() stopped after [n_stages] stages (0 = stem only);
    n_stages > len(stages) runs head+fc too. Scalar reduction so output
    transfer is negligible."""

    def fn(params, crops_u8):
        x = (crops_u8.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        x = efficientnet._conv(params['stem'], x, stride=2,
                               dtype=jnp.bfloat16)
        c_in = config.stem_channels
        for i_stage, (block, expansion, k, stride, c_out, layers) in \
                enumerate(config.stages[:n_stages]):
            sp = params['stage{}'.format(i_stage)]
            for i_layer in range(layers):
                bp = sp['b{}'.format(i_layer)]
                s = stride if i_layer == 0 else 1
                shortcut = x
                use_residual = (s == 1 and c_in == c_out)
                if block == 'fused':
                    if expansion == 1:
                        y = efficientnet._conv(bp['project'], x, stride=s,
                                               dtype=jnp.bfloat16)
                    else:
                        y = efficientnet._conv(bp['expand'], x, stride=s,
                                               dtype=jnp.bfloat16)
                        y = efficientnet._conv(bp['project'], y, act=False,
                                               dtype=jnp.bfloat16)
                else:
                    y = efficientnet._conv(bp['expand'], x,
                                           dtype=jnp.bfloat16)
                    c_exp = y.shape[-1]
                    y = efficientnet._conv(bp['dw'], y, stride=s,
                                           groups=c_exp, dtype=jnp.bfloat16)
                    y = efficientnet._se(bp, y, dtype=jnp.bfloat16)
                    y = efficientnet._conv(bp['project'], y, act=False,
                                           dtype=jnp.bfloat16)
                if use_residual:
                    y = y + shortcut
                x = y
                c_in = c_out
        if n_stages > len(config.stages):
            x = efficientnet._conv(params['head'], x, dtype=jnp.bfloat16)
            x = jnp.mean(x, axis=(1, 2))
            w = params['fc']['w'].astype(jnp.bfloat16)
            logits = jnp.dot(x, w,
                             preferred_element_type=jnp.float32)
            return logits[0, 0]
        return x[0, 0, 0, 0].astype(jnp.float32)
    return fn


def timed(fn_jit):
    out = fn_jit(params, crops)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [fn_jit(params, crops) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    return (time.time() - t0) / N


prev_t = None
print('{:>10s} {:>9s} {:>9s} {:>9s} {:>9s}'.format(
    'cut', 'total ms', 'seg ms', 'seg GMAC', 'TFLOP/s'), flush=True)
n_cuts = len(config.stages) + 2  # stem, stages..., head+fc
for i in range(n_cuts):
    f = jax.jit(truncated_apply(i))
    dt = timed(f)
    name = SEGS[i][0] if i < len(SEGS) else 'head+fc'
    seg_macs = (SEGS[i][1] if i < len(SEGS) else SEGS[-1][1]) * BATCH
    seg_ms = None if prev_t is None else (dt - prev_t) * 1000
    if i == 0:
        seg_ms = dt * 1000  # stem program cost includes normalize
    tflops = '' if seg_ms is None or seg_ms <= 0 else \
        '{:9.1f}'.format(2 * seg_macs / (seg_ms / 1000) / 1e12)
    print('{:>10s} {:9.2f} {:>9s} {:9.2f} {:>9s}'.format(
        name, dt * 1000,
        '' if seg_ms is None else '{:9.2f}'.format(seg_ms),
        seg_macs / 1e9, tflops), flush=True)
    prev_t = dt

total_macs = sum(m for _, m, _ in SEGS) * BATCH
print('\nfull: {:.2f} ms = {:.1f} crops/s; effective {:.1f} TFLOP/s'
      .format(prev_t * 1000, BATCH / prev_t,
              2 * total_macs / prev_t / 1e12), flush=True)
os._exit(0)
