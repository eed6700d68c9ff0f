"""
E2E: the production int8-chain step (bench.py's step_int8 — folded
early layers, chain quantization, fused candidate selection, NMS) with
conv_backend 'pallas' vs 'xla', at the 960x1280 rect canvas.

The Pallas 3x3 chain-conv kernel measured +4-9% per conv over XLA in
isolation (exp_pallas_conv3x3*.py); this measures what that buys the
whole step (3x3 stride-1 convs are ~55-65% of the forward FLOPs; the
rest — stride-2 downsamples, 1x1s, head, selection, NMS — stays XLA).

Run alone. Self-exits via watchdog. EXP_BACKENDS=pallas to measure just
one backend (fresh compiles of l6 programs through the relay take
minutes; do them one run at a time if the wall budget is tight).

INVALID-RESULT NOTE (found in round 4): the original version of this
script reused ONE step function object across set_conv_backend()
calls; jax.jit caches traces by function identity, so the second
backend silently re-ran the first backend's compiled program. The
round-3 conclusion "pallas e2e-neutral (384.0 vs 386.4 img/s)" is an
artifact — both numbers were the XLA program. Fixed here with a fresh
closure per backend; exp_e2e_bottleneck.py carries the valid A/B.
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
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import quantization as q
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '5'))
BACKENDS = os.environ.get('EXP_BACKENDS', 'xla,pallas').split(',')

CANVAS_H, CANVAS_W = 960, 1280

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params_f32 = folding.fold_early_params(
    yolov5.init_params(config, seed=0), config)
detect_name = 'l{}'.format(len(config.layers) - 1)
params_int8 = q.quantize_params_chain(
    params_f32, skip_names=(detect_name,),
    float_store_names=q.default_float_store(params_f32))
calib = np.random.RandomState(1).uniform(
    0, 1, (2, 320, 320, 3)).astype(np.float32)
q.calibrate_chain_scales(yolov5.apply, config, params_int8, calib)
params_int8 = jax.device_put(params_int8)

print('devices:', jax.devices(), flush=True)


def make_step():
    # fresh function object per backend — see INVALID-RESULT NOTE
    def step_int8(params, images_u8, conf, iou):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512)
        return nms_on_candidates(cands, iou, max_det=300)
    return step_int8


rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (BATCH, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(
    s, (1, CANVAS_H // 64, CANVAS_W // 64, 1)))
images = expand(jax.device_put(seed))
images.block_until_ready()

for backend in BACKENDS:
    q.set_conv_backend(backend)
    fn = jax.jit(make_step())
    try:
        out = fn(params_int8, images, jnp.float32(0.005),
                 jnp.float32(0.6))
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(backend, type(e).__name__,
                                         str(e)[:300]), flush=True)
        continue
    t0 = time.time()
    outs = [fn(params_int8, images, jnp.float32(0.005), jnp.float32(0.6))
            for _ in range(N_IT)]
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), outs[-1])
    dt = (time.time() - t0) / N_IT
    print('{:8s}: {:7.2f} ms/batch  {:6.1f} img/s'.format(
        backend, dt * 1000, BATCH / dt), flush=True)
    del outs, out

q.set_conv_backend('xla')
os._exit(0)
