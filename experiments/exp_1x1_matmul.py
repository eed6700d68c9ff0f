"""
Are mid-network 1x1 convs hitting matmul speed? Compare
lax.conv_general_dilated vs flattened dot at the C3 component shapes
(bf16, b64). A 1x1 conv IS a matmul [B*H*W, Cin] @ [Cin, Cout], and the
flatten is free for >=128-channel NHWC tensors (minor dim unchanged).
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

B = 64
N_IT = 6


def silu(y):
    return y * jax.nn.sigmoid(y)


_seed = [0]


def mk(shape, dtype=jnp.bfloat16):
    _seed[0] += 1
    f = jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, -1, 1).astype(dtype))
    out = f(jax.random.PRNGKey(_seed[0]))
    out.block_until_ready()
    return out


def bench(name, fn, args, flops):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = f(*args)
    _ = np.asarray(jax.device_get(out))
    t0 = time.time()
    outs = [f(*args) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    print('{:40s}: {:7.2f} ms  {:6.1f} TFLOP/s'.format(
        name, dt * 1000, flops / dt / 1e12), flush=True)
    del outs, out
    return dt


def conv1x1(x, w):
    return silu(jax.lax.conv_general_dilated(
        x, w[None, None], window_strides=(1, 1), padding=[(0, 0)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')))


def flat(x, w):
    b, h, wd, c = x.shape
    y = jnp.dot(x.reshape(b * h * wd, c), w,
                preferred_element_type=jnp.float32)
    return silu(y.astype(x.dtype)).reshape(b, h, wd, -1)


for (hw, cin, cout) in [(160, 256, 128), (160, 128, 128),
                        (80, 512, 256), (80, 256, 256),
                        (40, 768, 384), (20, 1024, 512)]:
    x = mk((B, hw, hw, cin))
    w = mk((cin, cout))
    fl = B * hw * hw * cin * cout * 2
    bench('1x1 {}->{} @{} conv'.format(cin, cout, hw), conv1x1, (x, w), fl)
    bench('1x1 {}->{} @{} flat dot'.format(cin, cout, hw), flat, (x, w), fl)
    del x, w
os._exit(0)
