"""
VERDICT-r4 item 1 e2e A/B: the device letterbox EMITS the h2+w4 folded
stem layout (ops/preprocess_device fold_layout='h2') so the h2-folded
l0 consumes it with no standalone relayout.

Motivating data (exp_stem_s2d, b64 bf16 960x1280):
    w4_base   11.75 ms   (production l0)
    h2_pre     9.76 ms   (h2 l0 on a pre-materialized folded input)
    h2_fused  11.00 ms   (transpose in-program, round-4 form)
    s2d2_pre  14.12 ms   (space-to-depth LOSES even with free input)
Round-4 e2e of the model-side h2 fold measured 0.986x (exp_h2_cm_e2e) —
the relayout + broken normalize->conv fusion ate the conv win. This
experiment moves the permute inside the letterbox epilogue (and, on the
identity path, onto the uint8 canvas at 1/4 the f32 traffic).

Configs (int8 chain, canvas 960x1280, staging 1024x1280, bf16 resize):
    w4_lb    w4 params, planar letterbox            (production today)
    h2_emit  h2 params, letterbox emits h2          (the candidate)
    h2_model h2 params, planar letterbox, model-side fold (round-4 form)
    w4_id    w4 params, identity slice              (production today)
    h2_id    h2 params, identity + u8 h2 view       (the candidate)

Run alone (one TPU process); self-exits via watchdog.
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
    from megadetector_tpu.ops.preprocess_device import (fold_canvas_h2,
                                                        letterbox_one)

    print('platform:', jax.devices()[0].platform, file=sys.stderr)

    config = yolov5.YoloV5Config('yolov5l6', num_classes=3)

    def make_params(h2):
        params_f32 = folding.fold_early_params(
            yolov5.init_params(config, seed=0), config, h2=h2)
        detect_name = 'l{}'.format(len(config.layers) - 1)
        params = q.quantize_params_chain(
            params_f32, skip_names=(detect_name,),
            float_store_names=q.default_float_store(params_f32))
        calib = np.random.RandomState(1).uniform(
            0, 1, (2, 320, 320, 3)).astype(np.float32)
        q.calibrate_chain_scales(yolov5.apply, config, params, calib)
        return jax.device_put(params)

    params_w4 = make_params(h2=False)
    params_h2 = make_params(h2=True)

    canvas = (960, 1280)
    scale_target = 1280
    staging = (1024, 1280)

    def forward(params, x_f32, conf):
        heads = yolov5.apply(config, params, x_f32.astype(jnp.bfloat16),
                             dtype=jnp.bfloat16, decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512)
        return nms_on_candidates(cands, jnp.float32(0.45), max_det=300)

    def make_lb_step(params, fold_layout):
        # Fresh closure per config: jax.jit caches by function identity
        def step(params, staged_u8, sizes, conf):
            x = jax.vmap(
                lambda img, hw: letterbox_one(
                    img, hw[0], hw[1], canvas,
                    scale_target=scale_target,
                    resize_dtype=jnp.bfloat16,
                    fold_layout=fold_layout)
            )(staged_u8, sizes)
            return forward(params, x, conf)
        return jax.jit(step)

    def make_id_step(params, h2_view):
        def step(params, staged_u8, sizes, conf):
            x = staged_u8[:, :canvas[0], :canvas[1], :]
            if h2_view:
                x = fold_canvas_h2(x)
            x = x.astype(jnp.float32) / jnp.float32(255.0)
            return forward(params, x, conf)
        return jax.jit(step)

    configs = [
        ('w4_lb', make_lb_step(params_w4, None), params_w4, (64, 128)),
        ('h2_emit', make_lb_step(params_h2, 'h2'), params_h2, (64, 128)),
        ('h2_model', make_lb_step(params_h2, None), params_h2, (128,)),
        ('w4_id', make_id_step(params_w4, False), params_w4, (128,)),
        ('h2_id', make_id_step(params_h2, True), params_h2, (128,)),
    ]

    rng = np.random.RandomState(0)
    for label, fn, params, batches in configs:
        for batch in batches:
            try:
                seed = rng.randint(0, 255, (batch, 64, 64, 3),
                                   dtype=np.uint8)
                expand = jax.jit(lambda s: jnp.tile(
                    s, (1, staging[0] // 64, staging[1] // 64, 1)))
                staged_d = expand(jax.device_put(seed))
                staged_d.block_until_ready()
                sizes_d = jax.device_put(
                    np.tile(np.int32([960, 1280]), (batch, 1)))
                _ = np.asarray(jax.device_get(sizes_d[:1]))

                t0 = time.time()
                out = fn(params, staged_d, sizes_d, jnp.float32(0.005))
                _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))
                print('{} b{}: compile+first {:.1f}s'.format(
                    label, batch, time.time() - t0), flush=True)

                n = 8
                t0 = time.time()
                outs = [fn(params, staged_d, sizes_d, jnp.float32(0.005))
                        for _ in range(n)]
                _ = np.asarray(jax.device_get(
                    outs[-1]['scores'].ravel()[:4]))
                dt = (time.time() - t0) / n
                print('{} b{}: {:.1f} img/s ({:.2f} ms/img)'.format(
                    label, batch, batch / dt, 1000.0 * dt / batch),
                    flush=True)
                del staged_d, outs, out
            except Exception as e:  # noqa: BLE001
                print('{} b{}: FAILED {}: {}'.format(
                    label, batch, type(e).__name__, str(e)[:300]),
                    flush=True)


main()
os._exit(0)
