"""Folded int8-chain batch sweep (64/96/128) + pre_nms_topk 512 vs 256."""

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
from megadetector_tpu.ops.nms import batched_nms

SIZE = 1280
N = 6
dtype = jnp.bfloat16

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
folded_f32 = folding.fold_early_params(yolov5.init_params(config, seed=0),
                                       config)
detect_name = 'l{}'.format(len(config.layers) - 1)
chained = q.quantize_params_chain(folded_f32, skip_names=(detect_name,),
                                  float_store_names=('l0',))
calib = np.random.RandomState(1).uniform(
    0, 1, (2, 320, 320, 3)).astype(np.float32)
q.calibrate_chain_scales(yolov5.apply, config, chained, calib)
p = jax.device_put(chained)

rng = np.random.RandomState(0)


def run(batch, topk):
    def step(p, images_u8, conf, iou):
        x = images_u8.astype(dtype) / dtype(255.0)
        pred = yolov5.apply(config, p, x, dtype=dtype)
        out = batched_nms(pred, conf, iou, max_det=300, pre_nms_topk=topk)
        return out['scores'][:, :4].sum()

    images = jax.device_put(rng.randint(
        0, 255, (batch, SIZE, SIZE, 3), dtype=np.uint8))
    _ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))
    f = jax.jit(step)
    out = f(p, images, jnp.float32(0.005), jnp.float32(0.45))
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(p, images, jnp.float32(0.005), jnp.float32(0.45))
            for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('b{:3d} topk{}: {:7.2f} ms ({:.2f} img/s)'.format(
        batch, topk, dt * 1000, batch / dt), flush=True)
    del images, outs, out


for batch, topk in ((64, 512), (64, 256), (96, 512), (128, 512),
                    (128, 256)):
    try:
        run(batch, topk)
    except Exception as e:
        print('b{} topk{} failed: {}'.format(batch, topk, str(e)[:100]),
              flush=True)
os._exit(0)
