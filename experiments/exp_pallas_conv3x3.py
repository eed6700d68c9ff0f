"""
Prototype: Pallas int8 3x3 stride-1 SAME conv for the chained-int8
forward (ops/quantization.py chained_conv), fused end-to-end:

    int8 x (at producer scale) -> in-kernel requant to x_scale ->
    9-tap int8 MXU accumulation (i32) -> f32 dequant+bias+SiLU ->
    requant to y_scale -> int8 out

vs the XLA path, which (a) materializes the inter-layer requant as an
extra int8 HBM round trip and (b) runs lax.conv at a measured 133-168
TOP/s where a Pallas fused matmul reaches ~200 (exp_pallas_int8_chain).

Layout: grid (B, H/bh); per step the kernel sees the row band plus
1-row halo refs above/below (read amplification 2/bh), builds the
padded tile in VMEM, and accumulates 9 shifted [bh*W, C] @ [C, Cout]
taps. Zero column-halo comes from an in-kernel pad (int8 zero-point is
0, so SAME-pad contributes nothing — exact).

EXP_INTERPRET=1 -> CPU numerics check vs an XLA reference of the same
math. Otherwise: hardware chain benchmark at the bulk l6 shapes.
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


# ------------------------------------------------------------ the kernel

def _conv3x3_kernel(top_ref, x_ref, bot_ref, w_ref, sc_ref, b_ref,
                    o_ref, *, n_bands, in_ratio, inv_y):
    i = pl.program_id(1)
    bh, w, c = x_ref.shape[1:]
    cout = o_ref.shape[-1]

    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n_bands - 1, jnp.zeros_like(bot_ref[0]),
                    bot_ref[0])
    x = jnp.concatenate([top, x_ref[0], bot], axis=0)  # (bh+2, W, C)

    if in_ratio != 1.0:
        x = jnp.clip(
            jnp.round(x.astype(jnp.float32) * np.float32(in_ratio)),
            -127, 127).astype(jnp.int8)

    # zero column halo (exact: symmetric-int8 zero point is 0)
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))  # (bh+2, W+2, C)

    acc = jnp.zeros((bh, w, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = x[dy:dy + bh, dx:dx + w, :]
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    y = acc.astype(jnp.float32) * sc_ref[0].reshape(1, 1, cout) \
        + b_ref[0].reshape(1, 1, cout)
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = jnp.clip(jnp.round(y * np.float32(inv_y)),
                        -127, 127).astype(jnp.int8)


def pallas_conv3x3(x_q, w_q, scale, bias, in_ratio, y_scale, bh=None):
    """
    x_q: [B,H,W,C] int8 at producer scale; in_ratio = prod_scale/x_scale.
    w_q: [3,3,C,Cout] int8. scale: [Cout] f32 = w_scale*x_scale.
    bias: [Cout] f32. Returns [B,H,W,Cout] int8 at y_scale.
    """

    bsz, h, w, c = x_q.shape
    cout = w_q.shape[-1]
    if bh is None:
        for cand in (40, 32, 30, 24, 16, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1):
            if h % cand == 0:
                bh = cand
                break
    n_bands = h // bh

    kern = functools.partial(
        _conv3x3_kernel, n_bands=n_bands,
        in_ratio=float(in_ratio), inv_y=1.0 / float(y_scale))

    return pl.pallas_call(
        kern,
        grid=(bsz, n_bands),
        in_specs=[
            # 1-row halos above/below (clamped at edges, masked in-kernel)
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.maximum(i * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, w, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, w, c),
                         lambda b, i: (b, jnp.minimum((i + 1) * bh, h - 1),
                                       0, 0)),
            pl.BlockSpec((3, 3, c, cout), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=INTERPRET,
    )(x_q, x_q, x_q, w_q, scale.reshape(1, cout), bias.reshape(1, cout))


# ----------------------------------------------------- XLA reference step

def xla_chain_step(x_q, w_q, scale, bias, in_ratio, y_scale):
    """Same math on the XLA path (incl. the materialized input requant)."""

    if in_ratio != 1.0:
        x_q = jnp.clip(
            jnp.round(x_q.astype(jnp.float32) * np.float32(in_ratio)),
            -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * scale.reshape(1, 1, 1, -1) \
        + bias.reshape(1, 1, 1, -1)
    y = y * jax.nn.sigmoid(y)
    return jnp.clip(jnp.round(y * np.float32(1.0 / y_scale)),
                    -127, 127).astype(jnp.int8)


# ------------------------------------------------------------------ main

RATIO = 0.8531  # representative non-trivial producer->x_scale ratio
Y_SCALE = 0.043

if INTERPRET:
    for (bsz, h, w, c, cout, bh) in [(2, 24, 40, 128, 128, 8),
                                     (1, 30, 40, 256, 128, 15),
                                     (1, 16, 16, 128, 256, 16)]:
        x = mk_i8((bsz, h, w, c))
        wq = mk_i8((3, 3, c, cout))
        sc = mk_f32((cout,), 1e-4, 4e-4)
        b = mk_f32((cout,), -0.5, 0.5)
        want = np.asarray(xla_chain_step(x, wq, sc, b, RATIO, Y_SCALE))
        got = np.asarray(pallas_conv3x3(x, wq, sc, b, RATIO, Y_SCALE,
                                        bh=bh))
        diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
        # bit-identical in f32-for-f32 interpret mode
        assert diff.max() == 0, (
            'mismatch at {}: max |diff| {} ({} cells)'.format(
                (bsz, h, w, c, cout), diff.max(), (diff > 0).sum()))
        print('numerics OK {}'.format((bsz, h, w, c, cout)), flush=True)
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
    print('{:50s}: {:7.3f} ms/step  {:6.1f} TOP/s'.format(
        name, per_step * 1000, ops_per_step / per_step / 1e12), flush=True)
    del outs, out
    return per_step


for (bsz, h, w, c) in [(64, 120, 160, 128), (64, 60, 80, 256),
                       (64, 30, 40, 512)]:
    x = mk_i8((bsz, h, w, c))
    wq = mk_i8((3, 3, c, c))
    sc = mk_f32((c,), 1e-4, 4e-4)
    b = mk_f32((c,), -0.5, 0.5)
    ops = 2.0 * bsz * h * w * c * c * 9

    def pallas_step(y, wq, sc, b):
        return pallas_conv3x3(y, wq, sc, b, RATIO, Y_SCALE)

    def xla_step(y, wq, sc, b):
        return xla_chain_step(y, wq, sc, b, RATIO, Y_SCALE)

    try:
        bench_chain('Pallas conv3x3 s8 {}x{} {}ch'.format(h, w, c),
                    pallas_step, x, (wq, sc, b), ops)
    except Exception as e:  # noqa: BLE001
        print('Pallas conv3x3 {}ch FAILED: {}: {}'.format(
            c, type(e).__name__, str(e)[:300]), flush=True)
    bench_chain('XLA conv3x3+requant s8 {}x{} {}ch'.format(h, w, c),
                xla_step, x, (wq, sc, b), ops)
    del x, wq, sc, b

os._exit(0)
