"""
End-to-end detector step: fused candidate selection (ops/decode.py wired
into TPUDetector._get_compiled) vs the unfused apply+batched_nms path, at
the production config (b64 @1280, bf16).

Pipelined timing (dispatch N, fence once). Run alone — never concurrently
with another TPU process.
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
from megadetector_tpu.ops.nms import batched_nms, nms_on_candidates
from megadetector_tpu.ops.decode import select_topk_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
SIZE = int(os.environ.get('EXP_SIZE', '1280'))
N = int(os.environ.get('EXP_N', '8'))
TOPK = int(os.environ.get('EXP_TOPK', '512'))

dtype = jnp.bfloat16
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16), yolov5.init_params(config, seed=0))
params = jax.device_put(params)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))  # fence upload


def unfused(params, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    pred = yolov5.apply(config, params, x, dtype=dtype)
    return batched_nms(pred, conf, iou, max_det=300, pre_nms_topk=TOPK)


def fused(params, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    heads = yolov5.apply(config, params, x, dtype=dtype, decode=False)
    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        conf, TOPK)
    return nms_on_candidates(cands, iou, max_det=300)


def time_fn(fn, label):
    f = jax.jit(fn)
    out = f(params, images, 0.005, 0.45)
    _ = np.asarray(jax.device_get(out['scores']))  # compile + warm
    t0 = time.time()
    outs = [f(params, images, 0.005, 0.45) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]['scores'][:1, :1]))
    dt = (time.time() - t0) / N
    print('{:24s}: {:7.2f} ms/step ({:6.1f} img/s)'.format(
        label, dt * 1000, BATCH / dt), flush=True)
    return out


o1 = time_fn(unfused, 'unfused apply+nms')
o2 = time_fn(fused, 'fused select+nms')

# Sanity: same survivors (random weights -> near-tied scores can swap
# tail candidates; compare score sets loosely)
s1 = np.asarray(jax.device_get(o1['scores'])).ravel()
s2 = np.asarray(jax.device_get(o2['scores'])).ravel()
print('score p99 |diff| on sorted sets: {:.5f}'.format(
    np.percentile(np.abs(np.sort(s1) - np.sort(s2)), 99)))
