"""
End-to-end step timing with folded early layers (b64 @1280):
plain bf16 vs folded bf16 vs folded int8-chain.
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
from megadetector_tpu.ops.nms import batched_nms

BATCH = int(os.environ.get('EXP_BATCH', '64'))
SIZE = int(os.environ.get('EXP_SIZE', '1280'))
N = int(os.environ.get('EXP_N', '8'))

dtype = jnp.bfloat16
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params_f32 = yolov5.init_params(config, seed=0)
folded_f32 = folding.fold_early_params(params_f32, config)

detect_name = 'l{}'.format(len(config.layers) - 1)
chain_folded = q.quantize_params_chain(folded_f32,
                                       skip_names=(detect_name,))
calib = np.random.RandomState(1).uniform(
    0, 1, (2, 320, 320, 3)).astype(np.float32)
q.calibrate_chain_scales(yolov5.apply, config, chain_folded, calib)

to_bf16 = lambda t: jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16)
    if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
    t)
params = jax.device_put(to_bf16(params_f32))
folded = jax.device_put(to_bf16(folded_f32))
chainf = jax.device_put(chain_folded)

rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(images[:1, :1, :1, 0]))


def step(p, images_u8, conf, iou):
    x = images_u8.astype(dtype) / dtype(255.0)
    pred = yolov5.apply(config, p, x, dtype=dtype)
    out = batched_nms(pred, conf, iou, max_det=300, pre_nms_topk=512)
    return out['scores'][:, :4].sum()


def time_step(p, label):
    f = jax.jit(step)
    out = f(p, images, jnp.float32(0.005), jnp.float32(0.45))
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(p, images, jnp.float32(0.005), jnp.float32(0.45))
            for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N
    print('{}: {:.2f} ms/step ({:.2f} img/s)'.format(
        label, dt * 1000, BATCH / dt), flush=True)
    return dt


time_step(params, 'plain bf16        ')
time_step(folded, 'folded bf16       ')
time_step(chainf, 'folded int8-chain ')
os._exit(0)
