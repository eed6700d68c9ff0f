"""
Device-letterbox stage breakdown: the serving combo pays ~0.30 ms/img
over the post-letterbox bench (408 vs 464 img/s b128) and the bf16
matmul A/B (exp_bf16_letterbox) moved it only ~1%, so the cost is NOT
the interpolation matmul dtype. Candidates: per-image interp-matrix
construction (iota compares over [out, src] maps inside vmap), the
two [H, W, 3] transposes around the horizontal matmul, the pad-mask
epilogue, or the staged-canvas HBM read itself.

Variants (all b64, staging 1024x1280 -> canvas 960x1280, reduce to a
scalar):
  full      — letterbox_batch as production runs it
  mat-only  — build both interp matrices per image, skip resize
  mm-only   — resize with PRECOMPUTED shared matrices (no per-image
              build, no mask), transposes included
  gather    — the elementwise 4-corner gather oracle
  copy      — staged u8 read -> f32 -> scalar (the traffic floor)

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1200')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.ops import preprocess_device as pd

B = int(os.environ.get('EXP_B', '64'))
S0 = (1024, 1280)
CANVAS = (960, 1280)
T = 1280

rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (B, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(
    s, (1, S0[0] // 64, S0[1] // 64, 1)))
staged = expand(jax.device_put(seed))
staged.block_until_ready()
sizes = jax.device_put(np.tile(np.int32([960, 1280]), (B, 1)))
_ = np.asarray(jax.device_get(sizes[:1]))


def v_full(staged, sizes):
    out = pd.letterbox_batch(staged, sizes, CANVAS, scale_target=T)
    return out[:, ::13, ::17, :].sum()


def v_mat_only(staged, sizes):
    def one(hw):
        h = hw[0].astype(jnp.float32)
        w = hw[1].astype(jnp.float32)
        r = jnp.minimum(T / h, T / w)
        new_w = jnp.round(w * r)
        new_h = jnp.round(h * r)
        oy = jnp.arange(CANVAS[0], dtype=jnp.float32)
        ox = jnp.arange(CANVAS[1], dtype=jnp.float32)
        top = jnp.floor((CANVAS[0] - new_h) / 2.0 - 0.1 + 0.5)
        left = jnp.floor((CANVAS[1] - new_w) / 2.0 - 0.1 + 0.5)
        sy = jnp.clip((oy - top + 0.5) * (h / new_h) - 0.5, 0.0, h - 1.0)
        sx = jnp.clip((ox - left + 0.5) * (w / new_w) - 0.5, 0.0, w - 1.0)
        m_v = pd._interp_matrix(sy, S0[0], hw[0])
        m_h = pd._interp_matrix(sx, S0[1], hw[1])
        return m_v[::7, ::11].sum() + m_h[::7, ::11].sum()
    return jax.vmap(one)(sizes).sum()


def v_mm_only(staged, m_v, m_h):
    def one(img):
        x = img.astype(jnp.bfloat16).reshape(S0[0], S0[1] * 3)
        y = jax.lax.dot_general(m_v, x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.reshape(CANVAS[0], S0[1], 3).transpose(0, 2, 1)
        out = jax.lax.dot_general(
            y.astype(jnp.bfloat16).reshape(CANVAS[0] * 3, S0[1]),
            m_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.reshape(CANVAS[0], 3, CANVAS[1]).transpose(0, 2, 1)
    out = jax.vmap(one)(staged)
    return out[:, ::13, ::17, :].sum()


def v_gather(staged, sizes):
    def one(img, hw):
        return pd.letterbox_one(img, hw[0], hw[1], CANVAS,
                                use_matmul=False, scale_target=T)
    out = jax.vmap(one)(staged, sizes)
    return out[:, ::13, ::17, :].sum()


def v_copy(staged, sizes):
    return staged.astype(jnp.float32)[:, ::13, ::17, :].sum()


mv_shared = jnp.asarray(
    rng.uniform(0, 1, (CANVAS[0], S0[0])), jnp.bfloat16)
mh_shared = jnp.asarray(
    rng.uniform(0, 1, (CANVAS[1], S0[1])), jnp.bfloat16).T

variants = [
    ('full', lambda: jax.jit(v_full), (staged, sizes)),
    ('mat-only', lambda: jax.jit(v_mat_only), (staged, sizes)),
    ('mm-only', lambda: jax.jit(v_mm_only), (staged, mv_shared,
                                             mh_shared)),
    ('gather', lambda: jax.jit(v_gather), (staged, sizes)),
    ('copy', lambda: jax.jit(v_copy), (staged, sizes)),
]

for label, mk, args in variants:
    f = mk()
    try:
        t0 = time.time()
        out = f(*args)
        _ = float(np.asarray(jax.device_get(out)))
        print('{}: compile+first {:.1f}s'.format(
            label, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(label, type(e).__name__,
                                         str(e)[:200]), flush=True)
        continue
    n = 10
    t0 = time.time()
    outs = [f(*args) for _ in range(n)]
    _ = float(np.asarray(jax.device_get(outs[-1])))
    dt = (time.time() - t0) / n
    print('{:9s}: {:7.2f} ms/batch ({:5.3f} ms/img)'.format(
        label, dt * 1000, dt * 1000 / B), flush=True)

os._exit(0)
