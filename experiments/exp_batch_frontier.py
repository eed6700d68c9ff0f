"""
VERDICT-r4 item 4: batch/canvas frontier sweep. b128 gained ~6% over
b64 — find the knee: measure the bench-style post-letterbox int8 step
(the BENCH_r0x configuration: canvas-resident uint8 batch -> normalize
-> forward -> fused selection -> NMS) at b128/b192/b256 on the 4:3
960x1280 canvas and the 16:9 768x1280 canvas.

Run alone (one TPU process); self-exits via watchdog. b256 staging is
~1 GB u8 + activations — failures are caught and reported, not fatal.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '3000')),
                lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from megadetector_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()

    from megadetector_tpu.models import yolov5
    from megadetector_tpu.ops import folding
    from megadetector_tpu.ops import quantization as q
    from megadetector_tpu.ops.decode import select_topk_candidates
    from megadetector_tpu.ops.nms import nms_on_candidates

    print('platform:', jax.devices()[0].platform, file=sys.stderr)

    config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
    params_f32 = folding.fold_early_params(
        yolov5.init_params(config, seed=0), config)
    detect_name = 'l{}'.format(len(config.layers) - 1)
    params = q.quantize_params_chain(
        params_f32, skip_names=(detect_name,),
        float_store_names=q.default_float_store(params_f32))
    calib = np.random.RandomState(1).uniform(
        0, 1, (2, 320, 320, 3)).astype(np.float32)
    q.calibrate_chain_scales(yolov5.apply, config, params, calib)
    params = jax.device_put(params)

    def step(params, images_u8, conf, iou):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512)
        return nms_on_candidates(cands, iou, max_det=300)

    rng = np.random.RandomState(0)
    for canvas in ((960, 1280), (768, 1280)):
        fn = jax.jit(step)  # fresh closure per canvas for cleanliness
        for batch in (128, 192, 256):
            try:
                seed = rng.randint(0, 255, (batch, 64, 64, 3),
                                   dtype=np.uint8)
                expand = jax.jit(lambda s: jnp.tile(
                    s, (1, canvas[0] // 64, canvas[1] // 64, 1)))
                images = expand(jax.device_put(seed))
                images.block_until_ready()

                t0 = time.time()
                out = fn(params, images, jnp.float32(0.005),
                         jnp.float32(0.45))
                _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))
                print('{}x{} b{}: compile+first {:.1f}s'.format(
                    canvas[0], canvas[1], batch, time.time() - t0),
                    flush=True)

                n = 8
                t0 = time.time()
                outs = [fn(params, images, jnp.float32(0.005),
                           jnp.float32(0.45)) for _ in range(n)]
                _ = np.asarray(jax.device_get(
                    outs[-1]['scores'].ravel()[:4]))
                dt = (time.time() - t0) / n
                print('{}x{} b{}: {:.1f} img/s ({:.2f} ms/img)'.format(
                    canvas[0], canvas[1], batch, batch / dt,
                    1000.0 * dt / batch), flush=True)
                del images, outs, out
            except Exception as e:  # noqa: BLE001
                print('{}x{} b{}: FAILED {}: {}'.format(
                    canvas[0], canvas[1], batch, type(e).__name__,
                    str(e)[:300]), flush=True)


main()
os._exit(0)
