"""
MBConv block anatomy: stage4-shaped blocks (176ch, 30x30, e6) run at
~48 TFLOP/s while the fused stages hit 125-155 (exp_clf_profile).
Attribute the per-block cost to its components by timing chained block
variants at the stage-4 shape:
  full   = expand 1x1 -> dw 3x3 -> SE -> project 1x1 -> +residual
  nose   = ... without SE
  nodw   = ... without dw
  mxu    = expand -> project -> residual only
Diffs: full-nose = SE cost, full-nodw = dw cost, nose-mxu ~ dw cost
cross-check. Also stage5 shape (304ch, 15x15).

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
N = int(os.environ.get('EXP_N', '6'))
L = int(os.environ.get('EXP_L', '8'))  # chained blocks per program


def run_shape(hw, c, expansion, label):
    rng = np.random.RandomState(0)
    c_exp = c * expansion
    c_se = max(1, c // 4)

    def mk_block(seed):
        r = np.random.RandomState(seed)

        def slot(k, ci, co, groups=1):
            fan_in = (ci // groups) * k * k
            w = (r.standard_normal((k, k, ci // groups, co))
                 .astype(np.float32) * np.sqrt(0.5 / fan_in))
            return {'w': jnp.asarray(w, jnp.bfloat16),
                    'b': jnp.zeros((co,), jnp.bfloat16)}

        return {
            'expand': slot(1, c, c_exp),
            'dw': slot(3, c_exp, c_exp, groups=c_exp),
            'se_reduce': slot(1, c_exp, c_se),
            'se_expand': slot(1, c_se, c_exp),
            'project': slot(1, c_exp, c),
        }

    blocks = [mk_block(i) for i in range(L)]
    blocks = jax.device_put(blocks)

    def make_fn(use_dw, use_se):
        def fn(blocks, x):
            for bp in blocks:
                shortcut = x
                y = efficientnet._conv(bp['expand'], x, dtype=jnp.bfloat16)
                if use_dw:
                    y = efficientnet._conv(bp['dw'], y, groups=c_exp,
                                           dtype=jnp.bfloat16)
                if use_se:
                    y = efficientnet._se(bp, y, dtype=jnp.bfloat16)
                y = efficientnet._conv(bp['project'], y, act=False,
                                       dtype=jnp.bfloat16)
                x = y + shortcut
            return x[0, 0, 0, 0].astype(jnp.float32)
        return fn

    x = jax.device_put((rng.standard_normal(
        (BATCH, hw, hw, c)) * 0.1).astype(jnp.bfloat16))
    _ = np.asarray(jax.device_get(x[:1, :1, :1, 0]))

    def timed(fn):
        f = jax.jit(fn)
        out = f(blocks, x)
        _ = np.asarray(jax.device_get(out))
        t0 = time.time()
        outs = [f(blocks, x) for _ in range(N)]
        _ = np.asarray(jax.device_get(outs[-1]))
        return (time.time() - t0) / N * 1000

    mxu_gmac = BATCH * hw * hw * (c * c_exp + c_exp * c) * L / 1e9
    dw_gmac = BATCH * hw * hw * c_exp * 9 * L / 1e9

    t_full = timed(make_fn(True, True))
    t_nose = timed(make_fn(True, False))
    t_nodw = timed(make_fn(False, True))
    t_mxu = timed(make_fn(False, False))
    print('{} [{}x{}x{} e{} L={}]: full {:.2f} nose {:.2f} nodw {:.2f} '
          'mxu {:.2f} ms'.format(label, hw, hw, c, expansion, L,
                                 t_full, t_nose, t_nodw, t_mxu),
          flush=True)
    print('  SE cost {:.2f} ms ({:.0f}%); dw cost {:.2f} ms ({:.0f}%); '
          'mxu-only rate {:.1f} TFLOP/s (dw+mxu {:.1f})'.format(
              t_full - t_nose, 100 * (t_full - t_nose) / t_full,
              t_full - t_nodw, 100 * (t_full - t_nodw) / t_full,
              2 * mxu_gmac / t_mxu,
              2 * (mxu_gmac + dw_gmac) / t_nose), flush=True)


print('backend:', jax.default_backend(), 'batch', BATCH, flush=True)
if os.environ.get('EXP_SMOKE'):
    run_shape(8, 16, 2, 'smoke')
else:
    run_shape(30, 176, 6, 'stage4')
    run_shape(15, 304, 6, 'stage5')
    run_shape(30, 160, 4, 'stage3')
os._exit(0)
