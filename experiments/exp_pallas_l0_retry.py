"""
Standing toolchain retry (VERDICT-r4 item 6): attempt to compile the
pallas_l0 fused stem kernel (ops/pallas_l0.py) on the current Mosaic
stack and print the outcome signature. The kernel is interpret-exact;
the only blocker is the in-VMEM 12-lane group split (vector reshape:
"unsupported shape cast" on the 2026-08-19 r4 stack). If this compiles
and validates, run experiments/exp_pallas_l0.py for the perf A/B next.

Also retries the bf16 VPU epilogue probe (any in-kernel bf16 vector
math failed Mosaic 'vector.broadcast' verification on the r3/r4
stacks) in a minimal standalone kernel.

Run alone; self-exits via watchdog. Compile failures are host-side
diagnostics and do not wedge the relay.
"""

import os
import sys
import threading

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '900')),
                lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding, pallas_l0

print('platform:', jax.devices()[0].platform, file=sys.stderr)

# --- probe 1: the fused l0 kernel ---
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                   config)
w_i, b_i = pallas_l0.prepare_l0_weights(folded['l0'])
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randint(0, 255, (1, 64, 128, 3),
                                 dtype=np.uint8))
try:
    out = pallas_l0.l0_fused(images, w_i, b_i, rows_per_band=8)
    got = np.asarray(jax.device_get(out))
    # validate vs the XLA folded conv
    l0_bf = {'w': jnp.asarray(folded['l0']['w'], jnp.bfloat16),
             'b': jnp.asarray(folded['l0']['b'], jnp.bfloat16)}
    x = images.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    xf = x.reshape(1, 64, 32, 12)
    ref = yolov5._conv(l0_bf, xf, (2, 1), jnp.bfloat16,
                       pad=((2, 2), (1, 1)))
    ref = np.asarray(jax.device_get(ref)).astype(np.float32)
    err = np.abs(got.astype(np.float32) - ref).max()
    print('pallas_l0: COMPILED AND RAN; max |diff| vs XLA = {:.4f}'
          .format(err), flush=True)
    print('-> toolchain unblocked: run exp_pallas_l0.py for the A/B',
          flush=True)
except Exception as e:  # noqa: BLE001
    msg = str(e).replace('\n', ' | ')[:400]
    print('pallas_l0: still blocked: {}: {}'.format(
        type(e).__name__, msg), flush=True)

# --- probe 2: minimal bf16 VPU epilogue ---
from jax.experimental import pallas as pl


def _bf16_kernel(x_ref, o_ref):
    x = x_ref[:]
    y = x * jax.nn.sigmoid(x)          # bf16 vector math in-kernel
    o_ref[:] = y


try:
    x = jnp.ones((8, 128), jnp.bfloat16)
    y = pl.pallas_call(
        _bf16_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
    )(x)
    _ = np.asarray(jax.device_get(y))
    print('bf16 VPU epilogue: COMPILED AND RAN', flush=True)
except Exception as e:  # noqa: BLE001
    msg = str(e).replace('\n', ' | ')[:300]
    print('bf16 VPU epilogue: still blocked: {}: {}'.format(
        type(e).__name__, msg), flush=True)

os._exit(0)
