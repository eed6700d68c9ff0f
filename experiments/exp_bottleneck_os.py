"""
VERDICT-r4 item 2: second Pallas shape for the fused bottleneck —
per-shape isolated A/B of the cv2 contraction schedules at the yolov5l6
C3 interior shapes: 'taps' (round-4 nine K=C dots, measured -2..-12%
vs XLA), 'im2col' (ONE output-stationary K=9C dot — the deep-K layout
the 202.5 TOP/s Pallas matmul proved), 'im2col3' (per-dy K=3C), vs the
unfused XLA chain. All Pallas variants are bit-identical by
construction (integer contraction; tests pin it).

Three chained bottlenecks per program (like C3 n=3) so dispatch
overhead amortizes. Fresh closure per backend/variant (jax.jit caches
by function identity — reusing one closure across set_* calls silently
re-runs the first trace). Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '2400')),
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
# (240,160,128) is the folded-l2 bottleneck (the HBM-bound C3, 74
# TOP/s in the stage profile); the rest are mid-network interiors.
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
    checksums = {}
    for label, maker, backend, variant in (
            ('xla    ', make_xla, 'xla', 'taps'),
            ('taps   ', make_fused, 'pallas', 'taps'),
            ('im2col ', make_fused, 'pallas', 'im2col'),
            ('im2col3', make_fused, 'pallas', 'im2col3')):
        q.set_conv_backend(backend)
        pb.set_variant(variant)
        f = jax.jit(maker())
        try:
            out = f(ms, x0)
            checksums[label] = int(np.asarray(jax.device_get(out)))
        except Exception as e:  # noqa: BLE001
            print('{}x{}x{} {} FAILED: {}'.format(
                h, w, c, label, str(e)[:300]), flush=True)
            continue
        n = 10
        t0 = time.time()
        outs = [f(ms, x0) for _ in range(n)]
        _ = int(np.asarray(jax.device_get(outs[-1])))
        dt = (time.time() - t0) / n
        print('{:3d}x{:3d}x{:3d} {}: {:7.2f} ms  {:6.1f} eff TOP/s'
              .format(h, w, c, label, dt * 1000,
                      2 * macs / dt / 1e12), flush=True)
    # bit-identity across fused variants on hardware
    fused_sums = {k: v for k, v in checksums.items() if k != 'xla    '}
    if len(set(fused_sums.values())) > 1:
        print('CHECKSUM MISMATCH across fused variants: {}'.format(
            checksums), flush=True)
    q.set_conv_backend('xla')
    pb.set_variant('taps')

os._exit(0)
