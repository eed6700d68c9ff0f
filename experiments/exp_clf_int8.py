"""
Classifier int8-chain e2e A/B: EfficientNetV2-M 480px b128 full forward
bf16 vs chained int8 (models/efficientnet.quantize_params_chain +
calibrated scales) at two float-stage policies.

Motivation (exp_clf_profile): the fused stages run at 125-149 TFLOP/s
bf16 — essentially the 162 TFLOP/s bf16 dot ceiling, while the int8
ceiling is 284 TOP/s — and the MBConv 1x1s are HBM-bound at the e6
expansion shapes, where int8 halves the residual/input bytes. dw/SE
stay float (VPU-bound, ~2% of FLOPs).

Drift stats on random He-init weights are informational only: the
BN-free inference graph explodes activations (documented
random-weight artifact, see perf-profile.md fold_stem entry) — real
checkpoints are the accuracy story, these numbers are the SPEED story.

Fresh closure per variant (jax.jit caches by function identity).
Run alone; self-exits via watchdog.

RESULTS (2026-08-20, v5e, V2-M 480px b128, w2-folded stem):
    bf16        1595.6 / 1569.5 crops/s (two runs)
    int8_s0f    1248.7 (-21.7%)
    int8_fused  1473.3 (-6.1%)
    int8_mb     1297.5 (-17.3%)
FALSIFIED as a speed lever on this toolchain: the float dw/SE break
the chain at every MBConv block, so project inputs pay a standalone
activation-quantize pass over the HBM-bound e6 expansion tensors
([B,30,30,1056]: ~0.35 ms/pass at 819 GB/s), and the fused stages are
lane-thin (C 24-96) at high resolution where int8's dot ceiling buys
nothing. The detector's chain won because its conv→conv chains are
unbroken and lane-full. Kept as a tested opt-in design point
(SpeciesClassifier quantize='int8').
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '3600')),
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
from megadetector_tpu.ops import quantization as q

BATCH = int(os.environ.get('EXP_BATCH', '128'))
SIZE = int(os.environ.get('EXP_SIZE', '480'))
N = int(os.environ.get('EXP_N', '8'))
ARCH = os.environ.get('EXP_ARCH', 'efficientnetv2_m')

print('backend:', jax.default_backend(), 'batch', BATCH,
      '{}px'.format(SIZE), ARCH, flush=True)

config = efficientnet.EfficientNetConfig(ARCH, num_classes=2000)
params_base = efficientnet.init_params(config, seed=0)
# damp the He-init explosion a bit (numerics are informational here)
params_base = jax.tree_util.tree_map(
    lambda a: a * 0.6 if a.ndim == 4 else a, params_base)
params_folded = efficientnet.fold_stem(params_base, mode='w2')

rng = np.random.RandomState(0)
crops = jax.device_put(rng.randint(
    0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(crops[:1, :1, :1, 0]))

calib = rng.rand(8, SIZE, SIZE, 3).astype(np.float32)

# Policies: which stages stay float under each variant
POLICIES = {
    'int8_s0f': ('stage0',),
    'int8_all': (),
    # mb-only: the HBM-bound 1x1s (C 160-512, expansions to 3072)
    'int8_mb': ('stage0', 'stage1', 'stage2'),
    # fused-only: the compute-bound 3x3 chains (C 24-192)
    'int8_fused': ('stage0', 'stage3', 'stage4', 'stage5', 'stage6'),
}

VARIANTS = tuple(os.environ.get(
    'EXP_VARIANTS', 'bf16,int8_s0f,int8_all').split(','))

results = {}
for variant in VARIANTS:
    if variant == 'bf16':
        p = jax.device_put(jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16), params_folded))
    else:
        fs = POLICIES[variant]
        pq = efficientnet.quantize_params_chain(
            params_folded, config, float_stages=fs)
        t0 = time.time()
        q.calibrate_chain_scales(efficientnet.apply, config, pq, calib)
        print('{}: calibrated in {:.1f}s'.format(
            variant, time.time() - t0), flush=True)
        p = jax.device_put(pq)

    def make_fn():
        def fn(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            logits = efficientnet.apply(config, params, x,
                                        dtype=jnp.bfloat16)
            return jax.nn.softmax(logits, axis=-1)
        return fn

    f = jax.jit(make_fn())
    t0 = time.time()
    out = f(p, crops)
    probs = np.asarray(jax.device_get(out), np.float32)
    print('{}: compiled+first in {:.1f}s'.format(
        variant, time.time() - t0), flush=True)
    t0 = time.time()
    outs = [f(p, crops) for _ in range(N)]
    _ = np.asarray(jax.device_get(outs[-1][:1, :4]))
    dt = (time.time() - t0) / N
    results[variant] = (BATCH / dt, probs)
    print('{}: {:.1f} crops/s ({:.2f} ms/batch)'.format(
        variant, BATCH / dt, dt * 1000), flush=True)
    del p, outs, out

base_rate, base_probs = results['bf16']
for variant in VARIANTS[1:]:
    rate, probs = results[variant]
    d = np.abs(probs - base_probs).max()
    am = (probs.argmax(axis=1) == base_probs.argmax(axis=1)).mean()
    print('{} vs bf16: {:+.1f}%  max prob diff {:.2e}  argmax agree '
          '{:.3f} (random-weight artifact, informational)'.format(
              variant, 100 * (rate / base_rate - 1), d, am),
          flush=True)
os._exit(0)
