"""
E2E A/B: verified approx candidate selection (ops/decode
_verified_approx_topk — approx_max_k + exact-count proof + lax.cond
fallback) vs plain exact per-level lax.top_k, on the production
int8-chain step at the 960x1280 rect canvas.

The stage profile (docs/perf-profile.md) puts select_topk at 13.1 ms of
the 146.4 ms b64 step; exp_topk_approx measured approx_max_k at ~half
the exact top_k cost at this shape. The verified path is identical by
construction, so any win here is free. Also cross-checks output
equality between the two variants on the same inputs.

Run alone. Self-exits via watchdog.
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
N_IT = int(os.environ.get('EXP_N', '8'))

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


def make_step(approx):
    # Fresh function object per variant (jax.jit caches by identity)
    def step_int8(params, images_u8, conf, iou):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512, approx=approx)
        return nms_on_candidates(cands, iou, max_det=300)
    return step_int8


rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (BATCH, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(
    s, (1, CANVAS_H // 64, CANVAS_W // 64, 1)))
images = expand(jax.device_put(seed))
images.block_until_ready()

results = {}
kept = {}
for label, approx in (('exact', False), ('approx', True)):
    fn = jax.jit(make_step(approx))
    try:
        t0 = time.time()
        out = fn(params_int8, images, jnp.float32(0.005),
                 jnp.float32(0.6))
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        print('{}: compile+first {:.1f}s'.format(
            label, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(label, type(e).__name__,
                                         str(e)[:300]), flush=True)
        continue
    kept[label] = jax.device_get(out)
    t0 = time.time()
    outs = [fn(params_int8, images, jnp.float32(0.005), jnp.float32(0.6))
            for _ in range(N_IT)]
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), outs[-1])
    dt = (time.time() - t0) / N_IT
    results[label] = BATCH / dt
    print('{:8s}: {:7.2f} ms/batch  {:6.1f} img/s'.format(
        label, dt * 1000, BATCH / dt), flush=True)
    del outs, out

if len(kept) == 2:
    a, e = kept['approx'], kept['exact']
    same_valid = bool(np.array_equal(a['valid'], e['valid']))
    v = e['valid']
    same_scores = bool(np.array_equal(a['scores'][v], e['scores'][v]))
    same_boxes = bool(np.array_equal(a['boxes'][v], e['boxes'][v]))
    print('identity on hardware: valid={} scores={} boxes={}'.format(
        same_valid, same_scores, same_boxes), flush=True)
if len(results) == 2:
    print('approx/exact: {:.3f}x'.format(
        results['approx'] / results['exact']), flush=True)
os._exit(0)
