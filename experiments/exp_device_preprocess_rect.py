"""
Measure the FULL device-side production path at the 4:3 rect canvas:
staged raw uint8 -> on-device matmul letterbox (960x1280, scale target
1280) -> int8-chain YOLOv5l6 forward -> fused candidate selection ->
NMS, steady-state pipelined timing, vs the post-letterbox step bench.py
measures. Answers: what does the on-device letterbox cost in-batch, and
does preprocess_mode=device hold the headline rate?

Staged input: 1536x2048 raw canvases (typical camera-trap source size)
-> staging rect (1536, 2048) at multiple 256. One TPU process; fenced
transfers; pipelined dispatch (NEXT.md measurement-host rules).

RESULTS (2026-08-17, v5e-1, fresh compiles):
    device-preprocess int8 batch 32: 341.8 img/s (2.93 ms/img)
    device-preprocess int8 batch 64: 362.8 img/s (2.76 ms/img)
vs the post-letterbox step (bench.py) at 423.5 img/s b64 / 439.5 b128:
the in-program letterbox costs ~0.4 ms/img — dominated by reading the
9.4 MB/img raw staging canvas from HBM (2.5x the 960x1280 canvas's
3.7 MB) plus the interpolation matmuls. Interpretation: host-letterbox
mode keeps the highest device rate when loader CPUs are plentiful;
device mode trades ~15% device throughput for a near-zero host.

FOLLOW-UP (same day): with DCT-scaled staging — the native loader's
decode_jpeg_scaled lands 2048x1536 sources at exactly 1280x960, staged
(1024, 1280) — the full device path recovers most of the gap:
    device-preprocess (dct staging) int8 batch 64:  379.7 img/s
    device-preprocess (dct staging) int8 batch 128: 408.0 img/s
i.e. 93% of the post-letterbox 439.5 img/s with the host doing only
scaled JPEG decode. This is the production serving configuration on
CPU-poor TPU hosts: --use_native_loader +
--detector_options preprocess_mode=device.

REFRESH (2026-08-18, after producer-scale folding in the int8 chain):
    device-preprocess (dct staging) int8 batch 64:  400.4 img/s
    device-preprocess (dct staging) int8 batch 128: 423.9 img/s
(91% of the folded post-letterbox 464.5; exp_device_preprocess_dct2.py)
"""

import sys
import time

import numpy as np


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
    for batch in (32, 64):
        staged = rng.randint(0, 255, (batch, 1536, 2048, 3),
                             dtype=np.uint8)
        sizes = np.tile(np.int32([1536, 2048]), (batch, 1))
        staged_d = jax.device_put(staged)
        sizes_d = jax.device_put(sizes)
        _ = np.asarray(jax.device_get(staged_d[:1, :1, :1]))  # fence

        # Warmup/compile
        out = fn(params, staged_d, sizes_d, jnp.float32(0.005),
                 jnp.float32(0.45))
        _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))

        n = 8
        t0 = time.time()
        outs = [fn(params, staged_d, sizes_d, jnp.float32(0.005),
                   jnp.float32(0.45)) for _ in range(n)]
        _ = np.asarray(jax.device_get(outs[-1]['scores'].ravel()[:4]))
        dt = (time.time() - t0) / n
        print('device-preprocess int8 batch {}: {:.2f} img/s '
              '({:.2f} ms/img)'.format(batch, batch / dt,
                                       1000.0 * dt / batch))


if __name__ == '__main__':
    import os
    import threading
    threading.Timer(1500, lambda: os._exit(3)).start()
    main()
    os._exit(0)
