"""
Per-segment forward cost at the production config (b64 @1280 bf16):
time apply() truncated after each layer; consecutive diffs give segment
costs. Run alone (one TPU process at a time).
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.models import yolov5

BATCH = int(os.environ.get('EXP_BATCH', '64'))
SIZE = int(os.environ.get('EXP_SIZE', '1280'))
N = int(os.environ.get('EXP_N', '6'))
CUTS = [int(c) for c in os.environ.get(
    'EXP_CUTS', '0,1,2,4,6,8,10,11,19,23,32').split(',')]

dtype = jnp.bfloat16
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16), yolov5.init_params(config, seed=0))
params = jax.device_put(params)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))


def truncated_apply(cut):
    def fn(params, images_u8):
        x = images_u8.astype(dtype) / dtype(255.0)
        saved = {}
        prev = x
        for i, entry in enumerate(config.layers[:cut + 1]):
            kind = entry['kind']
            name = 'l{}'.format(i)
            frm = entry['frm']
            if kind == 'conv':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._conv(params[name], src, entry['s'], dtype,
                                   pad=entry['p'])
            elif kind == 'c3':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._c3(params[name], src, entry['n'],
                                 entry['shortcut'], dtype)
            elif kind == 'sppf':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._sppf(params[name], src, entry['pool_k'], dtype)
            elif kind == 'up':
                src = prev if frm == -1 else saved[frm]
                out = yolov5._upsample2x(src)
            elif kind == 'cat':
                from megadetector_tpu.ops import quantization as q
                srcs = [prev if f == -1 else saved[f] for f in frm]
                out = q.qt_concat(srcs, axis=-1)
            elif kind == 'detect':
                outs = []
                for lvl, f in enumerate(frm):
                    outs.append(yolov5._conv_linear(
                        params[name]['m{}'.format(lvl)], saved[f], dtype))
                return sum(o[0, 0, 0, 0].astype(jnp.float32) for o in outs)
            if i in config.save_indices:
                saved[i] = out
            prev = out
        return prev[0, 0, 0, 0].astype(jnp.float32)
    return fn


prev_t = 0.0
prev_cut = None
for cut in CUTS:
    f = jax.jit(truncated_apply(cut))
    out = f(params, images)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(params, images) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    seg = '' if prev_cut is None else \
        '   [l{}..l{}: {:+.2f} ms]'.format(prev_cut + 1, cut,
                                           (dt - prev_t) * 1000)
    print('through l{:>2}: {:7.2f} ms{}'.format(cut, dt * 1000, seg),
          flush=True)
    prev_t = dt
    prev_cut = cut
os._exit(0)
