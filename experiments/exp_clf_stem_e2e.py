"""
Classifier stem-fold e2e A/B: EfficientNetV2-M 480px bf16 b128 full
forward with the stem unfolded vs width-folded w2/w4
(models/efficientnet.fold_stem) — the stem runs at ~1 TFLOP/s unfolded
(9.5 ms of 83, exp_clf_profile) because C_in=3 uses 27 of 128 MXU
lanes; the fold is a free row-major view + exact kernel rewrite
(bitwise-identical on CPU).

Fresh closure per variant (jax.jit caches by function identity — the
round-3 measurement trap). Output checksums verify identity on
hardware.

Run alone; self-exits via watchdog.
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

if os.environ.get('EXP_CPU'):
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import efficientnet

BATCH = int(os.environ.get('EXP_BATCH', '128'))
SIZE = int(os.environ.get('EXP_SIZE', '480'))
N = int(os.environ.get('EXP_N', '8'))
ARCH = os.environ.get('EXP_ARCH', 'efficientnetv2_m')

print('backend:', jax.default_backend(), 'batch', BATCH,
      '{}px'.format(SIZE), ARCH, flush=True)

config = efficientnet.EfficientNetConfig(ARCH, num_classes=2000)
params_base = efficientnet.init_params(config, seed=0)

rng = np.random.RandomState(0)
crops = jax.device_put(rng.randint(
    0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(crops[:1, :1, :1, 0]))

results = {}
for variant in ('base', 'w2', 'w4'):
    if variant == 'base':
        p = params_base
    else:
        p = efficientnet.fold_stem(params_base, mode=variant)
    p = jax.device_put(jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), p))

    def make_fn():
        # fresh closure per variant
        def fn(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            logits = efficientnet.apply(config, params, x,
                                        dtype=jnp.bfloat16)
            return jax.nn.softmax(logits, axis=-1)
        return fn

    f = jax.jit(make_fn())
    out = f(p, crops)
    probs = np.asarray(jax.device_get(out), np.float32)
    t0 = time.time()
    outs = [f(p, crops) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1][:1, :4]))
    dt = (time.time() - t0) / N
    results[variant] = (BATCH / dt, probs)
    print('{}: {:.1f} crops/s ({:.2f} ms/batch)'.format(
        variant, BATCH / dt, dt * 1000), flush=True)
    del p, outs, out

base_probs = results['base'][1]
for variant in ('w2', 'w4'):
    rate, probs = results[variant]
    d = np.abs(probs - base_probs).max()
    am = (probs.argmax(axis=1) == base_probs.argmax(axis=1)).mean()
    print('{} vs base: {:+.1f}%  max prob diff {:.2e}  argmax agree '
          '{:.3f}'.format(variant,
                          100 * (rate / results['base'][0] - 1), d, am),
          flush=True)
os._exit(0)
