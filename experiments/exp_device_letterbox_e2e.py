import os, sys, threading, time
threading.Timer(560, lambda: os._exit(3)).start()
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates
from megadetector_tpu.ops.preprocess_device import letterbox_one

B, SIZE, N = 64, 1280, 6
dtype = jnp.bfloat16
config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params = jax.device_put(jax.tree_util.tree_map(
    lambda a: jnp.asarray(a, jnp.bfloat16),
    folding.fold_early_params(yolov5.init_params(config, seed=0), config)))
rng = np.random.RandomState(0)
staged = jax.device_put(rng.randint(0, 255, (B, 2048, 2048, 3), dtype=np.uint8))
sizes = jax.device_put(np.tile(np.array([[1536, 2048]], np.int32), (B, 1)))
_ = np.asarray(jax.device_get(staged[:1,:1,:1,0]))
print('staged upload fenced', flush=True)

def step_devletter(params, staged_u8, hw, conf, iou):
    x = jax.vmap(lambda img, s: letterbox_one(img, s[0], s[1], SIZE))(staged_u8, hw)
    heads = yolov5.apply(config, params, x.astype(dtype), dtype=dtype, decode=False)
    c = select_topk_candidates(heads, config.anchors, config.strides, 3, conf, 512)
    return nms_on_candidates(c, iou, max_det=300)

f = jax.jit(step_devletter)
t0 = time.time()
out = f(params, staged, sizes, 0.005, 0.45)
_ = np.asarray(jax.device_get(out['scores'][:1,:1]))
print('compile+first run %.1fs' % (time.time()-t0), flush=True)
t0 = time.time()
outs = [f(params, staged, sizes, 0.005, 0.45) for _ in range(N)]
_ = np.asarray(jax.device_get(outs[-1]['scores'][:1,:1]))
dt = (time.time()-t0)/N
print('device-letterbox 2048x1536 + step: %.2f ms (%.1f img/s)' % (dt*1000, B/dt), flush=True)
os._exit(0)
