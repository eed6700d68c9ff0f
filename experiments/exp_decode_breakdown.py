"""
Measure where the post-forward time goes at the production config
(b64 @1280 bf16): forward-only vs +decode vs +decode+NMS.

Pipelined timing (dispatch N, fence once) per NEXT.md measurement notes.
Run alone — never concurrently with another TPU process.
"""

import os
import sys
import threading
import time

# Self-exit watchdog: a wedged tunnel must not hang the session
threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops.nms import batched_nms

BATCH = int(os.environ.get('EXP_BATCH', '64'))
SIZE = int(os.environ.get('EXP_SIZE', '1280'))
N = int(os.environ.get('EXP_N', '8'))

dtype = jnp.bfloat16
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16), yolov5.init_params(config, seed=0))
params = jax.device_put(params)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))  # fence upload


def fwd_only(params, images_u8):
    x = images_u8.astype(dtype) / dtype(255.0)
    heads = yolov5.apply(config, params, x, dtype=dtype, decode=False)
    # Tiny reduction so we fence real work without hauling heads to host
    return sum(h[0, 0, 0, 0].astype(jnp.float32) for h in heads)


def fwd_decode(params, images_u8):
    x = images_u8.astype(dtype) / dtype(255.0)
    pred = yolov5.apply(config, params, x, dtype=dtype)
    return pred[:, ::997, :].sum()


def fwd_decode_nms(params, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    pred = yolov5.apply(config, params, x, dtype=dtype)
    out = batched_nms(pred, conf, iou, max_det=300, pre_nms_topk=512)
    return out['scores'][:, :4].sum()


def time_fn(fn, args, label):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.device_get(out))  # compile + warm
    t0 = time.time()
    outs = [f(*args) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('{}: {:.2f} ms/step ({:.2f} img/s)'.format(
        label, dt * 1000, BATCH / dt), flush=True)
    return dt


from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates


def fused_step(params, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    heads = yolov5.apply(config, params, x, dtype=dtype, decode=False)
    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        conf, 512)
    out = nms_on_candidates(cands, iou, max_det=300)
    return out['scores'][:, :4].sum()


def fused_step_fixpoint(params, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    heads = yolov5.apply(config, params, x, dtype=dtype, decode=False)
    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        conf, 512)
    out = nms_on_candidates(cands, iou, max_det=300,
                            suppress_mode='fixpoint')
    return out['scores'][:, :4].sum()


def fused_select_only(params, images_u8, conf):
    x = images_u8.astype(dtype) / dtype(255.0)
    heads = yolov5.apply(config, params, x, dtype=dtype, decode=False)
    cands = select_topk_candidates(
        heads, config.anchors, config.strides, config.num_classes,
        conf, 512)
    return cands['scores'][:, :4].sum()


conf = jnp.float32(0.005)
iou = jnp.float32(0.45)
t_f = time_fn(fwd_only, (params, images), 'forward only            ')
t_d = time_fn(fwd_decode, (params, images), 'forward + decode        ')
t_n = time_fn(fwd_decode_nms, (params, images, conf, iou),
              'forward + decode + NMS  ')
t_s = time_fn(fused_select_only, (params, images, conf),
              'forward + fused select  ')
t_fu = time_fn(fused_step, (params, images, conf, iou),
               'fused select + loop NMS ')
t_fx = time_fn(fused_step_fixpoint, (params, images, conf, iou),
               'fused select + fixpt NMS')
print('decode: {:.2f} ms | NMS(loop): {:.2f} ms | fused select: {:.2f} ms'
      ' | fused total saves {:.2f} ms | fixpoint saves {:.2f} ms more'.format(
          (t_d - t_f) * 1000, (t_n - t_d) * 1000, (t_s - t_f) * 1000,
          (t_n - t_fu) * 1000, (t_fu - t_fx) * 1000))
os._exit(0)
