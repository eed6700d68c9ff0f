"""
Scout: where is the int8 ceiling, and can Pallas reach past XLA's conv?

XLA's int8 conv chain sustains ~155-172 TOP/s of the chip's 394 (NEXT.md).
Unmeasured so far:
  1. XLA int8 *matmul* (dot_general s8xs8->s32) at conv-as-matmul shapes —
     the toolchain's MXU int8 ceiling;
  2. a plain Pallas int8 matmul — whether Mosaic can match/beat (1);
  3. conv-as-im2col (conv_general_dilated_patches) + int8 dot at XLA
     level — a no-Pallas conv reformulation.
If (1)/(2) >> conv and (3) captures it, we get a cheap XLA-only win.
If only (2) wins, a Pallas direct-conv kernel is justified.

Run alone (one TPU process at a time). Self-exits via watchdog.
Set EXP_INTERPRET=1 to run the Pallas kernel in interpret mode on CPU
(numerics check only).
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

INTERPRET = os.environ.get('EXP_INTERPRET', '0') == '1'

import functools

import jax

if INTERPRET:
    # The env var alone is overridden by the site's external-plugin
    # registration; config update after import is authoritative.
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IT = int(os.environ.get('EXP_N', '6'))
_seed = [0]


def mk_i8(shape):
    _seed[0] += 1
    f = jax.jit(lambda k: jax.random.randint(
        k, shape, -127, 128, jnp.int32).astype(jnp.int8))
    out = f(jax.random.PRNGKey(_seed[0]))
    out.block_until_ready()
    return out


def bench(name, fn, args, ops):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = f(*args)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(*args) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    print('{:46s}: {:7.2f} ms  {:6.1f} TOP/s'.format(
        name, dt * 1000, ops / dt / 1e12), flush=True)
    del outs, out
    return dt


# ---------------------------------------------------------------- Pallas

def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.int32)


def pallas_mm_i8(a, b, bm=512, bn=512):
    """[M,K]s8 @ [K,N]s8 -> [M,N]s32; full-K blocks (K <= ~2.5k)."""

    m, k = a.shape
    _, n = b.shape
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        interpret=INTERPRET,
    )(a, b)


def _mm_kernel_acc(a_ref, b_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[:] = acc_ref[:]


def pallas_mm_i8_kloop(a, b, bm=512, bn=512, bk=512):
    m, k = a.shape
    _, n = b.shape
    n_k = k // bk
    grid = (m // bm, n // bn, n_k)
    return pl.pallas_call(
        functools.partial(_mm_kernel_acc, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=INTERPRET,
    )(a, b)


# ------------------------------------------------------------- XLA paths

def xla_mm_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def xla_conv_i8(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)


def xla_im2col_dot_i8(x, w):
    b, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # patches: [B, H, W, kh*kw*cin] int8
    y = jax.lax.dot_general(
        patches.reshape(b * h * wd, kh * kw * cin),
        w.reshape(kh * kw * cin, cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return y.reshape(b, h, wd, cout)


# ------------------------------------------------------------------ main

if INTERPRET:
    # Numerics check only
    a = mk_i8((1024, 1152))
    b = mk_i8((1152, 256))
    want = np.asarray(xla_mm_i8(a, b))
    got = np.asarray(pallas_mm_i8(a, b, bm=512, bn=256))
    assert np.array_equal(want, got), 'full-K kernel mismatch'
    got2 = np.asarray(pallas_mm_i8_kloop(a, b, bm=512, bn=256, bk=384))
    assert np.array_equal(want, got2), 'k-loop kernel mismatch'
    print('interpret-mode numerics OK', flush=True)
    os._exit(0)

print('devices:', jax.devices(), flush=True)

# Conv-as-matmul shapes (B=64 @960x1280 rect canvas, stride-8/16 levels)
MM_SHAPES = [
    # (M, K, N, note)
    (64 * 60 * 80, 1152, 256, 'conv3x3 128->256 @s16-like'),
    (64 * 60 * 80, 2304, 256, 'conv3x3 256->256 @s16-like'),
    (4096, 2048, 2048, 'square-ish'),
]

for m, k, n, note in MM_SHAPES:
    ops = 2.0 * m * k * n
    a = mk_i8((m, k))
    b = mk_i8((k, n))
    bench('XLA dot s8 {} [{}x{}x{}]'.format(note, m, k, n),
          xla_mm_i8, (a, b), ops)
    try:
        bench('Pallas fullK s8 {}'.format(note),
              lambda a, b: pallas_mm_i8(a, b, bm=512, bn=min(n, 512)),
              (a, b), ops)
    except Exception as e:  # noqa: BLE001
        print('Pallas fullK FAILED: {}: {}'.format(type(e).__name__,
                                                   str(e)[:200]), flush=True)
    try:
        bench('Pallas kloop s8 {}'.format(note),
              lambda a, b: pallas_mm_i8_kloop(a, b, bm=512,
                                              bn=min(n, 512),
                                              bk=min(k, 576)),
              (a, b), ops)
    except Exception as e:  # noqa: BLE001
        print('Pallas kloop FAILED: {}: {}'.format(type(e).__name__,
                                                   str(e)[:200]), flush=True)
    del a, b

# Real conv shapes: conv vs im2col+dot, int8
CONV_SHAPES = [
    # (B, H, W, Cin, Cout, k)
    (64, 120, 160, 128, 128, 3),
    (64, 60, 80, 256, 256, 3),
    (64, 30, 40, 512, 512, 3),
]
for bsz, h, wd, cin, cout, kk in CONV_SHAPES:
    x = mk_i8((bsz, h, wd, cin))
    w = mk_i8((kk, kk, cin, cout))
    ops = 2.0 * bsz * h * wd * cin * cout * kk * kk
    bench('XLA conv s8 {}x{} {}->{}'.format(h, wd, cin, cout),
          xla_conv_i8, (x, w), ops)
    bench('XLA im2col+dot s8 {}x{} {}->{}'.format(h, wd, cin, cout),
          xla_im2col_dot_i8, (x, w), ops)
    del x, w

os._exit(0)
