"""
Per-shape isolated A/B for the fused bottleneck kernel
(ops/pallas_bottleneck.py) vs the unfused XLA chain, at the three C3
interior shapes of yolov5l6 @960x1280. The full-step A/B measured the
fused backend 24% SLOWER (293.8 vs 387.2 img/s, exp_e2e_bottleneck);
this locates which shapes lose and by how much. Three chained
bottlenecks per program (like C3 n=3) so dispatch overhead amortizes.

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1500')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.ops import pallas_bottleneck as pb
from megadetector_tpu.ops import quantization as q

B = int(os.environ.get('EXP_B', '64'))
# (240,160,128) is the folded-l2 bottleneck — the HBM-bound C3 (the
# stage profile shows l2 at 74 TOP/s, consistent with activation
# traffic, where the fused kernel's 2.5x traffic cut should bite);
# the other three are the compute-bound mid-network interiors.
SHAPES = [(240, 160, 128), (120, 160, 128), (60, 80, 256),
          (30, 40, 384)]
N_BOT = 3

rng = np.random.RandomState(0)


def make_params(c):
    def conv(k, ys):
        w = rng.uniform(-0.4, 0.4, (k, k, c, c)).astype(np.float32)
        w_q, w_scale = q.quantize_conv_weight(w)
        return q.QConvParams({
            'w_q': jnp.asarray(w_q), 'w_scale': jnp.asarray(w_scale),
            'b': jnp.asarray(rng.uniform(-0.2, 0.2, (c,)), jnp.float32),
            'x_scale': 0.011, 'y_scale': ys})
    return [{'cv1': conv(1, 0.021), 'cv2': conv(3, 0.033)}
            for _ in range(N_BOT)]


for (h, w, c) in SHAPES:
    ms = make_params(c)
    ms = jax.device_put(ms)
    x0 = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, (B, h, w, c)).astype(np.int8)))
    x0.block_until_ready()

    def make_xla():
        def fn(ms, xq):
            y = q.QTensor(xq, 0.007)
            for m in ms:
                hh = q.chained_conv(m['cv1'], y, 1, 0)
                hh = q.chained_conv(m['cv2'], hh, 1, 1)
                y = q.qt_add(y, hh)
            return y.q.astype(jnp.int32).sum()
        return fn

    def make_fused():
        def fn(ms, xq):
            y = q.QTensor(xq, 0.007)
            for m in ms:
                out = q.fused_bottleneck(m, y, True)
                assert out is not None
                y = out
            return y.q.astype(jnp.int32).sum()
        return fn

    macs = N_BOT * 10 * c * c * h * w * B
    for label, maker, backend in (('xla  ', make_xla, 'xla'),
                                  ('fused', make_fused, 'pallas')):
        q.set_conv_backend(backend)
        f = jax.jit(maker())
        try:
            out = f(ms, x0)
            _ = int(np.asarray(jax.device_get(out)))
        except Exception as e:  # noqa: BLE001
            print('{}x{}x{} {} FAILED: {}'.format(
                h, w, c, label, str(e)[:200]), flush=True)
            continue
        n = 10
        t0 = time.time()
        outs = [f(ms, x0) for _ in range(n)]
        _ = int(np.asarray(jax.device_get(outs[-1])))
        dt = (time.time() - t0) / n
        print('{:3d}x{:3d}x{:3d} {}: {:7.2f} ms  {:6.1f} eff TOP/s'
              .format(h, w, c, label, dt * 1000,
                      2 * macs / dt / 1e12), flush=True)
    q.set_conv_backend('xla')

os._exit(0)
