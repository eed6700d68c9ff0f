"""
Hardware throughput for the non-flagship model families (none measured
before): RF-DETR (DINOv2 windowed ViT + deformable decoder, the
reference's .pth family) and YOLOv8 (the MDv1000/ultralytics family),
bf16, decoded forward. YOLOv5l6 @640 bf16 runs alongside as the
cross-family reference point.

Context for interpretation: RF-DETR is attention/gather-heavy (windowed
attention + multi-scale deformable sampling) — architecture at a
disadvantage on the MXU vs CNNs; YOLOv8's C2f is conv-dominated like
v5. MDv1000 speed ladder in the reference: redwood 1.0x MDv5 ... see
BASELINE.md.

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

threading.Timer(1500, lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

N_IT = int(os.environ.get('EXP_N', '6'))

print('platform:', jax.devices()[0].platform, file=sys.stderr)


def bench(label, apply_fn, config, params, size, batch):
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        params)
    params = jax.device_put(params)

    def step(params, images_u8):
        x = images_u8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        return apply_fn(config, params, x, dtype=jnp.bfloat16)

    fn = jax.jit(step)
    # seed tile must divide the target size exactly (e.g. 70 for the
    # 560px RF-DETR canvas, whose size_multiple is 56)
    t = 40 if size[0] % 40 == 0 else 70
    assert size[0] % t == 0 and size[1] % t == 0, (size, t)
    seed = np.random.RandomState(0).randint(
        0, 255, (batch, t, t, 3), dtype=np.uint8)
    expand = jax.jit(lambda s: jnp.tile(
        s, (1, size[0] // t, size[1] // t, 1)))
    images = expand(jax.device_put(seed))
    images.block_until_ready()

    def fence(out):
        # block_until_ready does not round-trip this remote relay;
        # fetching a small slice is the reliable fence (NEXT.md rules)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf.ravel()[:4]))

    try:
        out = fn(params, images)
        fence(out)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(label, type(e).__name__,
                                         str(e)[:200]), flush=True)
        return
    t0 = time.time()
    outs = [fn(params, images) for _ in range(N_IT)]
    fence(outs[-1])
    dt = (time.time() - t0) / N_IT
    print('{:44s}: {:7.1f} img/s ({:.2f} ms/img, batch {})'.format(
        label, batch / dt, 1000.0 * dt / batch, batch), flush=True)
    del outs, out, images, params


# --- RF-DETR base @560 (the reference rfdetr default resolution)
from megadetector_tpu.models import rfdetr
cfg_r = rfdetr.RFDetrConfig('rfdetr_base', num_classes=3, image_size=560)
params_r = rfdetr.init_params(cfg_r, seed=0)
for batch in (16, 32):
    bench('rfdetr_base bf16 @560', rfdetr.apply, cfg_r, params_r,
          (560, 560), batch)
del params_r

# --- YOLOv8l @640 (MDv1000-redwood class)
from megadetector_tpu.models import yolov8
cfg_8 = yolov8.YoloV8Config('yolov8l', num_classes=3)
params_8 = yolov8.init_params(cfg_8, seed=0)
for batch in (32, 64):
    bench('yolov8l bf16 @640', yolov8.apply, cfg_8, params_8,
          (640, 640), batch)
del params_8

# --- YOLOv5l6 @640 bf16 (cross-family reference point)
from megadetector_tpu.models import yolov5
cfg_5 = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params_5 = yolov5.init_params(cfg_5, seed=0)
for batch in (32, 64):
    bench('yolov5l6 bf16 @640 (unfolded)', yolov5.apply, cfg_5,
          params_5, (640, 640), batch)
del params_5

os._exit(0)
