"""
VERDICT-r4 item 9: two-stage (detector -> crops -> classifier) pipeline
profile at production batch sizes on one chip.

On a single chip the two stages share the MXU serially, so steady-state
two-stage throughput is 1 / (1/det_rate + crops_per_image/clf_rate);
this experiment measures the composed number directly by interleaving
the two programs' dispatches (the crop-extraction step itself is
host-side PIL in run_md_and_classifier — bounded-queue overlapped with
device work — so the device-side composition is the chip-limited
number). Sweep: classifier batch 64/128/256 at 480px (SpeciesNet crop
size) bf16, detector int8 b128 @960x1280, crops-per-image 0.5/1.0/2.0.

Run alone; self-exits via watchdog.
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

    from megadetector_tpu.models import efficientnet, yolov5
    from megadetector_tpu.ops import folding
    from megadetector_tpu.ops import quantization as q
    from megadetector_tpu.ops.decode import select_topk_candidates
    from megadetector_tpu.ops.nms import nms_on_candidates

    print('platform:', jax.devices()[0].platform, file=sys.stderr)

    # Detector: the production int8 chain at b128 on the 4:3 canvas
    config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
    params_f32 = folding.fold_early_params(
        yolov5.init_params(config, seed=0), config)
    detect_name = 'l{}'.format(len(config.layers) - 1)
    det_params = q.quantize_params_chain(
        params_f32, skip_names=(detect_name,),
        float_store_names=q.default_float_store(params_f32))
    calib = np.random.RandomState(1).uniform(
        0, 1, (2, 320, 320, 3)).astype(np.float32)
    q.calibrate_chain_scales(yolov5.apply, config, det_params, calib)
    det_params = jax.device_put(det_params)

    def det_step(params, images_u8, conf, iou):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512)
        return nms_on_candidates(cands, iou, max_det=300)

    det_fn = jax.jit(det_step)

    # Classifier: SpeciesNet-shaped EfficientNetV2-M at 480px bf16
    clf_config = efficientnet.EfficientNetConfig('efficientnetv2_m',
                                                 num_classes=2000)
    clf_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16),
        efficientnet.init_params(clf_config, seed=0))
    clf_params = jax.device_put(clf_params)

    def clf_step(params, crops_u8):
        x = crops_u8.astype(jnp.float32) / 255.0
        logits = efficientnet.apply(clf_config, params, x,
                                    dtype=jnp.bfloat16)
        return jax.nn.softmax(logits, axis=-1)

    clf_fn = jax.jit(clf_step)

    rng = np.random.RandomState(0)
    DET_B = 128
    seed = rng.randint(0, 255, (DET_B, 64, 64, 3), dtype=np.uint8)
    expand = jax.jit(lambda s: jnp.tile(s, (1, 960 // 64, 1280 // 64, 1)))
    det_images = expand(jax.device_put(seed))
    det_images.block_until_ready()

    # Stage rates in isolation first
    out = det_fn(det_params, det_images, jnp.float32(0.005),
                 jnp.float32(0.45))
    _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))
    n = 8
    t0 = time.time()
    outs = [det_fn(det_params, det_images, jnp.float32(0.005),
                   jnp.float32(0.45)) for _ in range(n)]
    _ = np.asarray(jax.device_get(outs[-1]['scores'].ravel()[:4]))
    det_rate = DET_B / ((time.time() - t0) / n)
    print('detector alone b{}: {:.1f} img/s'.format(DET_B, det_rate),
          flush=True)

    for clf_b in (64, 128, 256):
        try:
            cseed = rng.randint(0, 255, (clf_b, 32, 32, 3),
                                dtype=np.uint8)
            cexpand = jax.jit(lambda s: jnp.tile(s, (1, 15, 15, 1)))
            crops = cexpand(jax.device_put(cseed))
            crops.block_until_ready()

            cout = clf_fn(clf_params, crops)
            _ = np.asarray(jax.device_get(cout[:1, :4]))
            t0 = time.time()
            couts = [clf_fn(clf_params, crops) for _ in range(n)]
            _ = np.asarray(jax.device_get(couts[-1][:1, :4]))
            clf_rate = clf_b / ((time.time() - t0) / n)
            print('classifier alone 480px b{}: {:.1f} crops/s'.format(
                clf_b, clf_rate), flush=True)

            # Composed: interleave detector + classifier dispatches at a
            # crops-per-image ratio r: per det batch of 128 images,
            # dispatch ceil(128*r/clf_b) classifier batches
            for r in (0.5, 1.0, 2.0):
                n_clf = max(1, int(round(DET_B * r / clf_b)))
                t0 = time.time()
                last = None
                for _ in range(n):
                    _ = det_fn(det_params, det_images,
                               jnp.float32(0.005), jnp.float32(0.45))
                    for _ in range(n_clf):
                        last = clf_fn(clf_params, crops)
                _ = np.asarray(jax.device_get(last[:1, :4]))
                dt = (time.time() - t0) / n
                print('two-stage b{}+clf_b{} r={} ({} clf steps): '
                      '{:.1f} img/s'.format(
                          DET_B, clf_b, r, n_clf, DET_B / dt),
                      flush=True)
            del crops, couts, cout
        except Exception as e:  # noqa: BLE001
            print('clf_b{}: FAILED {}: {}'.format(
                clf_b, type(e).__name__, str(e)[:300]), flush=True)


main()
os._exit(0)
