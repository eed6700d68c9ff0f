"""
Two-stage pipeline classifier-stage throughput on TPU: EfficientNetV2
(SpeciesNet-shaped) crop classification at 480px (SpeciesNet's input)
and 224px, bf16 vs f32, the same compiled program SpeciesClassifier
builds (normalize -> forward -> softmax).

Context: the reference's classification stage runs a torch classifier
at batch 8 on GPU (run_md_and_speciesnet.py:69). Camera-trap workloads
classify 0-3 crops per detected image, so the classifier stage needs
roughly the detector's img/s in crops/s to never be the bottleneck
(detector: 464.5 img/s int8 @b128).

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

threading.Timer(1500, lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import efficientnet

print('platform:', jax.devices()[0].platform, file=sys.stderr)

ARCH = os.environ.get('EXP_ARCH', 'efficientnetv2_m')
N_IT = int(os.environ.get('EXP_N', '8'))

config = efficientnet.EfficientNetConfig(ARCH, num_classes=2000)
params_f32 = efficientnet.init_params(config, seed=0)

for dtype_name, dtype in (('bf16', jnp.bfloat16), ('f32', jnp.float32)):
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype), params_f32)
    params = jax.device_put(params)

    def program(params, crops_u8):
        x = crops_u8.astype(jnp.float32) / 255.0
        logits = efficientnet.apply(config, params, x, dtype=dtype)
        return jax.nn.softmax(logits, axis=-1)

    fn = jax.jit(program)

    for size in (480, 224):
        for batch in (32, 64):
            seed = np.random.RandomState(0).randint(
                0, 255, (batch, 32, 32, 3), dtype=np.uint8)
            expand = jax.jit(lambda s, size=size: jnp.tile(
                s, (1, size // 32, size // 32, 1)))
            crops = expand(jax.device_put(seed))
            crops.block_until_ready()

            try:
                out = fn(params, crops)
                _ = np.asarray(jax.device_get(out[:1, :4]))
            except Exception as e:  # noqa: BLE001
                print('{} {}px b{} FAILED: {}: {}'.format(
                    dtype_name, size, batch, type(e).__name__,
                    str(e)[:160]), flush=True)
                continue
            t0 = time.time()
            outs = [fn(params, crops) for _ in range(N_IT)]
            _ = np.asarray(jax.device_get(outs[-1][:1, :4]))
            dt = (time.time() - t0) / N_IT
            print('{} {} {}px batch {}: {:7.1f} crops/s '
                  '({:.2f} ms/crop)'.format(
                      ARCH, dtype_name, size, batch, batch / dt,
                      1000.0 * dt / batch), flush=True)
            del crops, outs, out
    del params

os._exit(0)
