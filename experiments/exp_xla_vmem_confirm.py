"""
Confirm-or-falsify the +0.79% from xla_tpu_scoped_vmem_limit_kib=32768
seen in exp_xla_flags.py (the only non-negative flag in that sweep;
64/96 MB LOSE 0.9-1.5%, so the fusion emitter's scratch budget is
non-monotone and the default is near-optimal already).

Method: compile BOTH programs once (baseline options=None and
vmem=32768 via lowered.compile(compiler_options=...)), then run
alternating timed blocks A/B/A/B/A/B (3 blocks each, 8 steps/block) so
relay drift hits both arms equally. Decision rule written before the
run: land the flag as a production default only if the interleaved
mean gain is >= +1.0% (the measured b128 rep-to-rep spread); otherwise
record e2e-neutral in the ledger and keep the default compiler.

Results: docs/perf-profile.md ledger ("XLA compiler-flag frontier").
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1800')),
                lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

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

    batch, canvas = 128, (960, 1280)
    seed = np.random.RandomState(0).randint(
        0, 255, (batch, 64, 64, 3), dtype=np.uint8)
    images = jax.jit(lambda s: jnp.tile(
        s, (1, canvas[0] // 64, canvas[1] // 64, 1)))(
            jax.device_put(seed))
    images.block_until_ready()

    conf = jnp.float32(0.005)
    iou = jnp.float32(0.45)
    lowered = jax.jit(step).lower(params, images, conf, iou)

    arms = {}
    for name, opts in (('baseline', None),
                       ('vmem32768',
                        {'xla_tpu_scoped_vmem_limit_kib': '32768'})):
        t0 = time.time()
        compiled = lowered.compile(compiler_options=opts)
        out = compiled(params, images, conf, iou)
        _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))
        print('{} compiled {:.0f}s'.format(name, time.time() - t0),
              flush=True)
        arms[name] = compiled

    n_blocks, n_steps = 3, 8
    rates = {k: [] for k in arms}
    for b in range(n_blocks):
        for name, compiled in arms.items():
            t0 = time.time()
            outs = [compiled(params, images, conf, iou)
                    for _ in range(n_steps)]
            _ = np.asarray(jax.device_get(outs[-1]['scores'].ravel()[:4]))
            rate = batch * n_steps / (time.time() - t0)
            rates[name].append(rate)
            print('block {} {:10s} {:6.1f} img/s'.format(b, name, rate),
                  flush=True)

    means = {k: float(np.mean(v)) for k, v in rates.items()}
    gain = 100 * (means['vmem32768'] / means['baseline'] - 1)
    print('MEANS baseline {:.1f} vmem32768 {:.1f}  gain {:+.2f}%'.format(
        means['baseline'], means['vmem32768'], gain), flush=True)
    print('VERDICT:', 'LAND' if gain >= 1.0 else 'NEUTRAL-do-not-land',
          flush=True)


main()
os._exit(0)
