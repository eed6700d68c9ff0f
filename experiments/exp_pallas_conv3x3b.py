"""
Variant sweep for the Pallas int8 3x3 conv (exp_pallas_conv3x3 found
only +4-5% over XLA with rank-3 tap dots). Variants:

  rank3  — 9 taps as rank-3 dot_general (baseline from v1)
  flat   — taps collapsed to [bh*W, C] @ [C, Cout] 2D dots
  im2col — VMEM patch matrix [bh*W, 9C], ONE dot at K=9C (the shape
           Pallas mm ran at ~200 TOP/s in exp_pallas_int8_chain)
  nosilu — flat without the SiLU epilogue (bounds epilogue cost)

plus a pure-mm control at [bh*W-equivalent M, K=9C, N=Cout] for the
per-shape Pallas matmul ceiling.

EXP_INTERPRET=1 -> CPU numerics check of flat/im2col vs rank3.
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


def mk_f32(shape, lo=-1.0, hi=1.0):
    _seed[0] += 1
    f = jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32, lo, hi))
    out = f(jax.random.PRNGKey(_seed[0]))
    out.block_until_ready()
    return out


RATIO = 0.8531
Y_SCALE = 0.043


def _conv_kernel(top_ref, x_ref, bot_ref, w_ref, sc_ref, b_ref,
                 o_ref, *, n_bands, in_ratio, inv_y, mode, silu):
    i = pl.program_id(1)
    bh, w, c = x_ref.shape[1:]
    cout = o_ref.shape[-1]

    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n_bands - 1, jnp.zeros_like(bot_ref[0]),
                    bot_ref[0])
    x = jnp.concatenate([top, x_ref[0], bot], axis=0)

    if in_ratio != 1.0:
        x = jnp.clip(
            jnp.round(x.astype(jnp.float32) * np.float32(in_ratio)),
            -127, 127).astype(jnp.int8)

    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))  # (bh+2, W+2, C)

    if mode == 'rank3':
        acc = jnp.zeros((bh, w, cout), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    x[dy:dy + bh, dx:dx + w, :], w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sc_ref[0].reshape(1, 1, cout) \
            + b_ref[0].reshape(1, 1, cout)
    elif mode == 'flat':
        acc = jnp.zeros((bh * w, cout), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                xs = x[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sc_ref[0] + b_ref[0]
    else:  # im2col
        patches = jnp.concatenate(
            [x[dy:dy + bh, dx:dx + w, :].reshape(bh * w, c)
             for dy in range(3) for dx in range(3)], axis=1)
        acc = jax.lax.dot_general(
            patches, w_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sc_ref[0] + b_ref[0]

    if silu:
        y = y * jax.nn.sigmoid(y)
    out = jnp.clip(jnp.round(y * np.float32(inv_y)),
                   -127, 127).astype(jnp.int8)
    o_ref[0] = out.reshape(1, bh, w, cout)[0] if mode == 'rank3' \
        else out.reshape(bh, w, cout)


def pallas_conv3x3(x_q, w_q, scale, bias, in_ratio, y_scale, bh,
                   mode='flat', silu=True):
    bsz, h, w, c = x_q.shape
    cout = w_q.shape[-1]
    n_bands = h // bh
    assert h % bh == 0

    if mode == 'im2col':
        w_arg = np.ascontiguousarray(
            np.asarray(w_q).reshape(9 * c, cout))
        w_arg = jax.device_put(jnp.asarray(w_arg))
        w_spec = pl.BlockSpec((9 * c, cout), lambda b, i: (0, 0))
    else:
        w_arg = w_q
        w_spec = pl.BlockSpec((3, 3, c, cout), lambda b, i: (0, 0, 0, 0))

    kern = functools.partial(
        _conv_kernel, n_bands=n_bands, in_ratio=float(in_ratio),
        inv_y=1.0 / float(y_scale), mode=mode, silu=silu)

    return pl.pallas_call(
        kern,
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, h - 1),
                                       0, 0)),
            w_spec,
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=INTERPRET,
    )(x_q, x_q, x_q, w_arg, scale.reshape(1, cout), bias.reshape(1, cout))


if INTERPRET:
    for mode in ('flat', 'im2col'):
        x = mk_i8((2, 24, 40, 128))
        wq = mk_i8((3, 3, 128, 128))
        sc = mk_f32((128,), 1e-4, 4e-4)
        b = mk_f32((128,), -0.5, 0.5)
        want = np.asarray(pallas_conv3x3(x, wq, sc, b, RATIO, Y_SCALE,
                                         bh=8, mode='rank3'))
        got = np.asarray(pallas_conv3x3(x, wq, sc, b, RATIO, Y_SCALE,
                                        bh=8, mode=mode))
        assert np.array_equal(want, got), '{} mismatch'.format(mode)
        print('numerics OK', mode, flush=True)
    os._exit(0)

print('devices:', jax.devices(), flush=True)


def bench_chain(name, step, x, args, ops_per_step):
    def chained(x, args):
        y = x
        for _ in range(CHAIN):
            y = step(y, *args)
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(chained)
    out = f(x, args)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(x, args) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    per_step = dt / CHAIN
    print('{:52s}: {:7.3f} ms/step  {:6.1f} TOP/s'.format(
        name, per_step * 1000, ops_per_step / per_step / 1e12), flush=True)
    del outs, out
    return per_step


SHAPES = [(64, 120, 160, 128, (8, 20)),
          (64, 60, 80, 256, (12, 30)),
          (64, 30, 40, 512, (15, 30))]

for (bsz, h, w, c, bhs) in SHAPES:
    x = mk_i8((bsz, h, w, c))
    wq = mk_i8((3, 3, c, c))
    sc = mk_f32((c,), 1e-4, 4e-4)
    b = mk_f32((c,), -0.5, 0.5)
    ops = 2.0 * bsz * h * w * c * c * 9

    for mode in ('flat', 'im2col'):
        for bh in bhs:
            try:
                bench_chain(
                    'Pallas {} bh={} {}x{} {}ch'.format(mode, bh, h, w, c),
                    lambda y, wq, sc, b, bh=bh, mode=mode: pallas_conv3x3(
                        y, wq, sc, b, RATIO, Y_SCALE, bh=bh, mode=mode),
                    x, (wq, sc, b), ops)
            except Exception as e:  # noqa: BLE001
                print('{} bh={} {}ch FAILED: {}: {}'.format(
                    mode, bh, c, type(e).__name__, str(e)[:200]),
                    flush=True)
    try:
        bench_chain(
            'Pallas flat-nosilu bh={} {}ch'.format(bhs[0], c),
            lambda y, wq, sc, b: pallas_conv3x3(
                y, wq, sc, b, RATIO, Y_SCALE, bh=bhs[0], mode='flat',
                silu=False),
            x, (wq, sc, b), ops)
    except Exception as e:  # noqa: BLE001
        print('nosilu {}ch FAILED: {}: {}'.format(
            c, type(e).__name__, str(e)[:200]), flush=True)
    del x, wq, sc, b

os._exit(0)
