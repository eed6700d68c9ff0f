"""
l0 stem-conv formulations: the profiled l0..l1 block costs ~30 ms of a
146 ms b64 step (exp_int8_stage_profile) at an effective ~33 TOP/s —
the folded stem conv contracts only C_in=12 of 128 MXU lanes per tap
(~9% utilization). Candidates, all computing the SAME folded-l0 output
[B, 480, 320, 128] from the folded input [B, 960, 320, 12]:

  conv      — current: XLA conv_general_dilated, kernel [6,3,12,128]
  im2col    — 18 strided slices concatenated to [B, 480, 320, 216]
              (materialized in HBM: ~4.3 GB at b64 bf16, ~10 ms of
              round-trip traffic) then ONE [*, 216] @ [216, 128] dot at
              84% lane utilization
  rowdot    — 6 per-ky dots of K=36 (3 kx shifts concatenated), no
              large intermediate, 28% lanes

Each timed as normalize + variant + scalar reduce at b64; the ~5.5 ms
relay dispatch floor is common to all three, so compare differences.
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

B = int(os.environ.get('EXP_B', '64'))
H, W = 960, 1280
WF, CF = W // 4, 12       # folded-by-4 input view
C0 = 128                  # folded l0 output channels (2*64)

rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (B, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(s, (1, H // 64, W // 64, 1)))
images = expand(jax.device_put(seed))
images.block_until_ready()

wf = jnp.asarray(rng.uniform(-0.2, 0.2, (6, 3, CF, C0)), jnp.bfloat16)
bias = jnp.asarray(rng.uniform(-0.1, 0.1, (C0,)), jnp.bfloat16)


def norm_fold(images_u8):
    x = images_u8.astype(jnp.float32) / jnp.float32(255.0)
    return x.reshape(B, H, WF, CF).astype(jnp.bfloat16)


def v_conv(images_u8):
    x = norm_fold(images_u8)
    y = jax.lax.conv_general_dilated(
        x, wf, window_strides=(2, 1), padding=((2, 2), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = y + bias
    y = y * jax.nn.sigmoid(y)
    return y[:, ::7, ::7, ::31].astype(jnp.float32).sum()


def _patches(x):
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)))
    cols = []
    for ky in range(6):
        for kx in range(3):
            cols.append(jax.lax.slice(
                xp, (0, ky, kx, 0), (B, ky + 2 * 480 - 1, kx + WF, CF),
                (1, 2, 1, 1)))
    return jnp.concatenate(cols, axis=-1)          # [B, 480, WF, 216]


def v_im2col(images_u8):
    x = norm_fold(images_u8)
    p = _patches(x)
    wmat = wf.reshape(6 * 3 * CF, C0)
    y = jax.lax.dot_general(
        p.reshape(B * 480 * WF, 6 * 3 * CF), wmat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = y.reshape(B, 480, WF, C0) + bias
    y = y * jax.nn.sigmoid(y)
    return y[:, ::7, ::7, ::31].astype(jnp.float32).sum()


def v_rowdot(images_u8):
    x = norm_fold(images_u8)
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)))
    acc = jnp.zeros((B, 480, WF, C0), jnp.float32)
    for ky in range(6):
        row = jax.lax.slice(
            xp, (0, ky, 0, 0), (B, ky + 2 * 480 - 1, WF + 2, CF),
            (1, 2, 1, 1))                           # [B, 480, WF+2, 12]
        shifts = jnp.concatenate(
            [row[:, :, kx:kx + WF, :] for kx in range(3)], axis=-1)
        wrow = jnp.concatenate([wf[ky, kx] for kx in range(3)], axis=0)
        acc = acc + jax.lax.dot_general(
            shifts.reshape(B * 480 * WF, 3 * CF), wrow,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(
                B, 480, WF, C0)
    y = acc.astype(jnp.bfloat16) + bias
    y = y * jax.nn.sigmoid(y)
    return y[:, ::7, ::7, ::31].astype(jnp.float32).sum()


def v_im2col_int8(images_u8):
    # u8 - 128 is exactly representable in int8 (conv linearity folds
    # the constant 128 shift into the bias), so an int8 l0 loses NO
    # pixel fidelity and runs the MXU at the 2x s8 rate. Here the
    # epilogue scale stands in for the /255 normalize.
    x = (images_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    x = x.reshape(B, H, WF, CF)
    p = _patches_i8(x)
    wmat = jnp.round(wf.astype(jnp.float32) * 127).astype(
        jnp.int8).reshape(6 * 3 * CF, C0)
    y = jax.lax.dot_general(
        p.reshape(B * 480 * WF, 6 * 3 * CF), wmat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * jnp.float32(1.0 / (127 * 255))
    y = y.reshape(B, 480, WF, C0).astype(jnp.bfloat16) + bias
    y = y * jax.nn.sigmoid(y)
    return y[:, ::7, ::7, ::31].astype(jnp.float32).sum()


def _patches_i8(x):
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0)))
    cols = []
    for ky in range(6):
        for kx in range(3):
            cols.append(jax.lax.slice(
                xp, (0, ky, kx, 0), (B, ky + 2 * 480 - 1, kx + WF, CF),
                (1, 2, 1, 1)))
    return jnp.concatenate(cols, axis=-1)


for label, fn in (('conv', v_conv), ('im2col', v_im2col),
                  ('rowdot', v_rowdot), ('im2col_i8', v_im2col_int8)):
    f = jax.jit(fn)
    try:
        t0 = time.time()
        out = f(images)
        _ = float(np.asarray(jax.device_get(out)))
        print('{}: compile+first {:.1f}s'.format(label, time.time() - t0),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(label, type(e).__name__,
                                         str(e)[:200]), flush=True)
        continue
    n = 8
    t0 = time.time()
    outs = [f(images) for _ in range(n)]
    _ = float(np.asarray(jax.device_get(outs[-1])))
    dt = (time.time() - t0) / n
    print('{:8s}: {:7.2f} ms/batch'.format(label, dt * 1000), flush=True)

os._exit(0)
