"""
E2E A/B on the production int8-chain step (b64, 960x1280 rect canvas):

  base   : w4 l0 fold ([6,3,12,*], 18 taps at K=12) + row-major select
  h2     : h2+w4 l0 fold ([3,3,24,*], 9 taps at K=24, fold_l0_h2)
  h2cm   : h2 fold + channel-major selection (_select_level_cm)
  cm     : w4 fold + channel-major selection (isolates the select win)

The stage profile charges ~24.5 ms to normalize+l0..l1 (stem at ~9% MXU
lane utilization from K=12 taps) and 13.1 ms to selection (8-wide minor
dim elementwise). fold_l0_h2 halves the stem tap count; _select_level_cm
moves the full-map score work onto full vector lanes.

Each variant gets a fresh closure (jax.jit caches by function identity —
the round-3 A/B trap). Cross-checks: h2-vs-base detection drift (bf16
reduction-order tolerance) and cm-vs-rm identity. Run alone; self-exits.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '3000')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding
from megadetector_tpu.ops import quantization as q
from megadetector_tpu.ops.decode import select_topk_candidates
from megadetector_tpu.ops.nms import nms_on_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '8'))
CANVAS_H, CANVAS_W = 960, 1280

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
detect_name = 'l{}'.format(len(config.layers) - 1)
raw_params = yolov5.init_params(config, seed=0)
calib = np.random.RandomState(1).uniform(
    0, 1, (2, 320, 320, 3)).astype(np.float32)


def chain_params(h2):
    p = folding.fold_early_params(raw_params, config, h2=h2)
    pi = q.quantize_params_chain(
        p, skip_names=(detect_name,),
        float_store_names=q.default_float_store(p))
    q.calibrate_chain_scales(yolov5.apply, config, pi, calib)
    return jax.device_put(pi)


params_by_fold = {False: chain_params(False), True: chain_params(True)}
print('devices:', jax.devices(), flush=True)


def make_step(channel_major):
    def step(params, images_u8, conf, iou):
        x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
        heads = yolov5.apply(config, params, x, dtype=jnp.bfloat16,
                             decode=False)
        cands = select_topk_candidates(
            heads, config.anchors, config.strides, config.num_classes,
            conf, 512, approx=True, channel_major=channel_major)
        return nms_on_candidates(cands, iou, max_det=300)
    return step


rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (BATCH, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(
    s, (1, CANVAS_H // 64, CANVAS_W // 64, 1)))
images = expand(jax.device_put(seed))
images.block_until_ready()

variants = [
    ('base', False, False),
    ('h2', True, False),
    ('h2cm', True, True),
    ('cm', False, True),
]

results = {}
kept = {}
for label, h2, cmaj in variants:
    fn = jax.jit(make_step(cmaj))
    params = params_by_fold[h2]
    try:
        t0 = time.time()
        out = fn(params, images, jnp.float32(0.005), jnp.float32(0.6))
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        print('{}: compile+first {:.1f}s'.format(
            label, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(label, type(e).__name__,
                                         str(e)[:300]), flush=True)
        continue
    kept[label] = jax.device_get(out)
    t0 = time.time()
    outs = [fn(params, images, jnp.float32(0.005), jnp.float32(0.6))
            for _ in range(N_IT)]
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), outs[-1])
    dt = (time.time() - t0) / N_IT
    results[label] = BATCH / dt
    print('{:6s}: {:7.2f} ms/batch  {:6.1f} img/s'.format(
        label, dt * 1000, BATCH / dt), flush=True)
    del outs, out

for a, b in (('h2', 'base'), ('h2cm', 'h2'), ('cm', 'base'),
             ('h2cm', 'base')):
    if a in results and b in results:
        print('{} / {}: {:.3f}x'.format(
            a, b, results[a] / results[b]), flush=True)

# cm must be identical to rm on the same params (same candidate set;
# random logits make exact ties measure-zero)
if 'base' in kept and 'cm' in kept:
    e, c = kept['base'], kept['cm']
    v = e['valid']
    print('cm identity: valid={} scores={} boxes={}'.format(
        bool(np.array_equal(c['valid'], e['valid'])),
        bool(np.array_equal(c['scores'][v], e['scores'][v])),
        bool(np.array_equal(c['boxes'][v], e['boxes'][v]))), flush=True)
# h2 changes l0's bf16 reduction order: report drift stats
if 'base' in kept and 'h2' in kept:
    e, h = kept['base'], kept['h2']
    ne, nh = int(e['valid'].sum()), int(h['valid'].sum())
    k = min(e['scores'].shape[1], h['scores'].shape[1])
    ds = np.abs(e['scores'][:, :k] - h['scores'][:, :k])[
        e['valid'][:, :k] & h['valid'][:, :k]]
    print('h2 drift: n {} vs {}; score p50/p99/max {:.2e} {:.2e} {:.2e}'
          .format(ne, nh, *np.percentile(ds, [50, 99, 100])),
          flush=True)
os._exit(0)
