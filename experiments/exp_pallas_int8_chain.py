"""
Scout v2 (chained): real int8 MXU rates through XLA dot / Pallas dot /
XLA conv, measured as DEPENDENT CHAINS inside one program so the ~5.5 ms
relay fixed overhead amortizes (see NEXT.md measurement-host gotchas —
never trust absolute one-op times through this relay; exp_pallas_int8_
matmul.py's single-op numbers are relay-floor artifacts).

Chain step = int8 op -> cheap requant epilogue (cast/scale/clip to int8),
exactly like the production int8 chain (ops/quantization.py). CHAIN
steps per program x N_IT programs.

Run alone. Self-exits via watchdog.
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
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IT = int(os.environ.get('EXP_N', '4'))
CHAIN = int(os.environ.get('EXP_CHAIN', '8'))
_seed = [0]


def mk_i8(shape):
    _seed[0] += 1
    f = jax.jit(lambda k: jax.random.randint(
        k, shape, -127, 128, jnp.int32).astype(jnp.int8))
    out = f(jax.random.PRNGKey(_seed[0]))
    out.block_until_ready()
    return out


def requant(y_i32):
    """int32 -> int8 epilogue (scale+clip), like the production chain."""

    return jnp.clip(jnp.round(y_i32.astype(jnp.float32) * np.float32(3e-4)),
                    -127, 127).astype(jnp.int8)


def bench_chain(name, step, x, ws, ops_per_step):
    def chained(x, ws):
        y = x
        for i in range(CHAIN):
            y = step(y, ws[i % len(ws)])
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(chained)
    out = f(x, ws)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(x, ws) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    per_step = dt / CHAIN
    print('{:46s}: {:7.3f} ms/step  {:6.1f} TOP/s'.format(
        name, per_step * 1000, ops_per_step / per_step / 1e12), flush=True)
    del outs, out
    return per_step


# ---------------------------------------------------------------- Pallas

def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.int32)


def pallas_mm_i8(a, b, bm=512, bn=512):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=INTERPRET,
    )(a, b)


def _mm_kernel_fused(a_ref, b_ref, o_ref):
    y = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = jnp.clip(
        jnp.round(y.astype(jnp.float32) * np.float32(3e-4)),
        -127, 127).astype(jnp.int8)


def pallas_mm_i8_fused(a, b, bm=512, bn=512):
    """Matmul with the requant epilogue fused INTO the kernel (int8 out)."""

    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        _mm_kernel_fused,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        interpret=INTERPRET,
    )(a, b)


# ------------------------------------------------------------- steps

def step_xla_dot(y, w):
    return requant(jax.lax.dot_general(
        y, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))


def step_pallas_dot(y, w):
    return requant(pallas_mm_i8(y, w))


def step_pallas_dot_fused(y, w):
    return pallas_mm_i8_fused(y, w)


def step_xla_conv(y, w):
    return requant(jax.lax.conv_general_dilated(
        y, w, window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32))


def step_bf16_dot(y, w):
    out = jnp.dot(y, w, preferred_element_type=jnp.float32)
    return (out * 3e-4).astype(jnp.bfloat16)


# ------------------------------------------------------------------ main

if INTERPRET:
    a = mk_i8((512, 1152))
    b = mk_i8((1152, 512))
    want = np.asarray(step_xla_dot(a, b))
    got = np.asarray(step_pallas_dot(a, b))
    assert np.array_equal(want, got), 'pallas chain step mismatch'
    got_f = np.asarray(step_pallas_dot_fused(a, b))
    assert np.array_equal(want, got_f), 'pallas fused step mismatch'
    print('interpret-mode numerics OK', flush=True)
    os._exit(0)

print('devices:', jax.devices(), flush=True)

# --- matmul chains: [M,K] @ [K,K], requant between steps
M, K = 65536, 1152
ops = 2.0 * M * K * K
x = mk_i8((M, K))
ws = [mk_i8((K, K)) for _ in range(2)]
bench_chain('XLA dot s8 chain [{}x{}x{}]'.format(M, K, K),
            step_xla_dot, x, ws, ops)
bench_chain('Pallas dot s8 chain', step_pallas_dot, x, ws, ops)
bench_chain('Pallas dot s8 fused-epilogue chain',
            step_pallas_dot_fused, x, ws, ops)
wsb = [w.astype(jnp.bfloat16) for w in ws]
bench_chain('bf16 dot chain (reference)', step_bf16_dot,
            x.astype(jnp.bfloat16), wsb, ops)
del x, ws, wsb

# --- K=2304 (256ch 3x3 im2col-like)
M, K = 32768, 2304
ops = 2.0 * M * K * K
x = mk_i8((M, K))
ws = [mk_i8((K, K)) for _ in range(2)]
bench_chain('XLA dot s8 chain [{}x{}x{}]'.format(M, K, K),
            step_xla_dot, x, ws, ops)
bench_chain('Pallas dot s8 fused-epilogue chain',
            step_pallas_dot_fused, x, ws, ops)
del x, ws

# --- conv chains at the bulk shapes
for bsz, h, wd, c in [(64, 120, 160, 128), (64, 60, 80, 256),
                      (64, 30, 40, 512)]:
    x = mk_i8((bsz, h, wd, c))
    ws = [mk_i8((3, 3, c, c)) for _ in range(2)]
    ops = 2.0 * bsz * h * wd * c * c * 9
    bench_chain('XLA conv s8 chain {}x{} {}ch'.format(h, wd, c),
                step_xla_conv, x, ws, ops)
    del x, ws

os._exit(0)
