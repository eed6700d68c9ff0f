"""
XLA TPU-compiler flag frontier for the bench-style int8 step.

Every prior perf lever restructured the PROGRAM (stem folds, selection,
Pallas kernels); this sweeps the COMPILER's own knobs, which no round
had tried.

Channel discovery (matters for reproducing): TPU-backend flags in
XLA_FLAGS are FATAL on this relay — the local process's
parse_flags_from_env only knows generic --xla_* flags ("Unknown flag in
XLA_FLAGS: --xla_tpu_scoped_vmem_limit_kib", F-level abort), because
compilation happens on the remote side of the axon tunnel. The working
channel is jit(f).lower(...).compile(compiler_options={...}), which
rides PJRT to the remote compiler and IS validated there (garbage
option names come back HTTP 500 from /remote_compile; real ones
compile and run).

Flags swept (public XLA/TPU tuning surface):
- xla_tpu_scoped_vmem_limit_kib=N — scratch VMEM budget per fusion;
  larger values let the fusion emitter build bigger fusions
- xla_tpu_enable_latency_hiding_scheduler=false — scheduler toggle
- xla_tpu_rwb_fusion=false — reduce+broadcast fusion toggle
- xla_tpu_dot_dot_fusion=false — dot-into-dot fusion toggle

Program: the BENCH_r0x configuration (int8-chain yolov5l6 @960x1280
b128, post-letterbox, fused selection + NMS), fresh remote compile per
config (no persistent cache — a falsification sweep must not rest on
cache keying). Run alone; self-exits via watchdog.

Results: see docs/perf-profile.md ledger.
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

CONFIGS = [
    ('baseline', None),
    ('scoped_vmem=32768', {'xla_tpu_scoped_vmem_limit_kib': '32768'}),
    ('scoped_vmem=65536', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('scoped_vmem=98304', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('latency_hiding=false',
     {'xla_tpu_enable_latency_hiding_scheduler': 'false'}),
    ('rwb_fusion=false', {'xla_tpu_rwb_fusion': 'false'}),
    ('dot_dot_fusion=false', {'xla_tpu_dot_dot_fusion': 'false'}),
]


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

    base_rate = None
    for name, opts in CONFIGS:
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts)
            out = compiled(params, images, conf, iou)
            _ = np.asarray(jax.device_get(out['scores'].ravel()[:4]))
            compile_s = time.time() - t0

            n = 8
            t0 = time.time()
            outs = [compiled(params, images, conf, iou)
                    for _ in range(n)]
            _ = np.asarray(jax.device_get(outs[-1]['scores'].ravel()[:4]))
            dt = (time.time() - t0) / n
            rate = batch / dt
            if base_rate is None:
                base_rate = rate
            print('{:24s} {:6.1f} img/s ({:+.2f}% vs baseline, '
                  'compile {:.0f}s)'.format(
                      name, rate, 100 * (rate / base_rate - 1),
                      compile_s), flush=True)
            del compiled, outs, out
        except Exception as e:  # noqa: BLE001
            print('{:24s} FAILED {}: {}'.format(
                name, type(e).__name__,
                str(e)[:200].replace('\n', ' ')), flush=True)


main()
os._exit(0)
