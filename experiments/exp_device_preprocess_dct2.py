"""
Refresh of the production serving-combo number after producer-scale
folding (quantization.chained_conv): DCT-scaled staging (the native
loader's decode_jpeg_scaled lands 2048x1536 sources at 1280x960,
staged on a (1024, 1280) rect) -> on-device letterbox -> int8-chain
forward -> fused selection -> NMS.

Pre-folding result (2026-08-17): 379.7 img/s b64 / 408.0 img/s b128
(exp_device_preprocess_rect.py FOLLOW-UP). Post-letterbox bench.py
moved 439.5 -> 464.5 with scale folding; this measures how much the
serving combo recovers.

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

threading.Timer(1500, lambda: os._exit(3)).start()

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
    from megadetector_tpu.ops.preprocess_device import letterbox_one

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

    canvas = (960, 1280)
    scale_target = 1280
    staging = (1024, 1280)

    def step(params, staged_u8, sizes, conf, iou):
        x = jax.vmap(
            lambda img, hw: letterbox_one(img, hw[0], hw[1], canvas,
                                          scale_target=scale_target)
        )(staged_u8, sizes)
        heads = yolov5.apply(config, params, x.astype(jnp.bfloat16),
                             dtype=jnp.bfloat16, decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512)
        return nms_on_candidates(cands, jnp.float32(0.45), max_det=300)

    fn = jax.jit(step)

    rng = np.random.RandomState(0)
    for batch in (64, 128):
        # device-side expand of a small seed: the tunnel moves ~45 MB/s,
        # so shipping full staged batches from the host would dominate
        seed = rng.randint(0, 255, (batch, 64, 64, 3), dtype=np.uint8)
        expand = jax.jit(lambda s: jnp.tile(
            s, (1, staging[0] // 64, staging[1] // 64, 1)))
        staged_d = expand(jax.device_put(seed))
        staged_d.block_until_ready()
        sizes_d = jax.device_put(
            np.tile(np.int32([960, 1280]), (batch, 1)))
        _ = np.asarray(jax.device_get(sizes_d[:1]))

        out = fn(params, staged_d, sizes_d, jnp.float32(0.005),
                 jnp.float32(0.45))
        _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))

        n = 8
        t0 = time.time()
        outs = [fn(params, staged_d, sizes_d, jnp.float32(0.005),
                   jnp.float32(0.45)) for _ in range(n)]
        _ = np.asarray(jax.device_get(outs[-1]['scores'].ravel()[:4]))
        dt = (time.time() - t0) / n
        print('device-preprocess (dct staging) int8 batch {}: '
              '{:.1f} img/s ({:.2f} ms/img)'.format(
                  batch, batch / dt, 1000.0 * dt / batch), flush=True)
        del staged_d, outs, out


main()
os._exit(0)
