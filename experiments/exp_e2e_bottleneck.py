"""
E2E A/B: the production int8-chain step with the FUSED bottleneck
Pallas kernel (ops/pallas_bottleneck.py: 1x1 -> 3x3 -> residual add in
one kernel, no h1 HBM round trip, epilogues inside the boundary) vs
plain XLA, at the 960x1280 rect canvas.

Context: the per-conv Pallas kernel was e2e-neutral (384.0 vs 386.4
img/s @b64, exp_e2e_pallas_conv.py) because the pallas_call boundary
blocked XLA's fusion of the surrounding requant/add epilogues. The
fused bottleneck swallows those epilogues, so this measures whether
the boundary penalty — not the kernel math — was the whole story.

Run alone. Self-exits via watchdog. EXP_BACKENDS=pallas for one
backend per run if the wall budget is tight; a token may carry a cv2
contraction variant as backend:variant (e.g. pallas:im2col — the
output-stationary K=9C schedule, VERDICT-r4 item 2).
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1100')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import quantization as q
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))
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
    # A FRESH function object per backend: jax.jit caches traces by
    # function identity, so reusing one step function across
    # set_conv_backend() calls silently re-runs the first backend's
    # program (observed: "pallas" compiled in 0.3s = cache hit on the
    # xla executable)
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

from megadetector_tpu.ops import pallas_bottleneck as pb

results = {}
for token in BACKENDS:
    backend, _, variant = token.partition(':')
    q.set_conv_backend(backend)
    pb.set_variant(variant or 'taps')
    fn = jax.jit(make_step())
    try:
        t0 = time.time()
        out = fn(params_int8, images, jnp.float32(0.005),
                 jnp.float32(0.6))
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        print('{}: compile+first {:.1f}s'.format(
            token, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(token, type(e).__name__,
                                         str(e)[:300]), flush=True)
        continue
    t0 = time.time()
    outs = [fn(params_int8, images, jnp.float32(0.005), jnp.float32(0.6))
            for _ in range(N_IT)]
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), outs[-1])
    dt = (time.time() - t0) / N_IT
    results[token] = BATCH / dt
    print('{:8s}: {:7.2f} ms/batch  {:6.1f} img/s'.format(
        token, dt * 1000, BATCH / dt), flush=True)
    del outs, out

if 'xla' in results:
    for k, v in results.items():
        if k != 'xla':
            print('{}/xla: {:.3f}x'.format(k, v / results['xla']),
                  flush=True)
q.set_conv_backend('xla')
pb.set_variant('taps')
os._exit(0)
