"""
Width-folding experiments: pack W-pixel pairs into channels so 64-channel
tensors present full 128 lanes to the TPU, with structured kernels that
keep the math exact. Inputs are pre-folded (producers would emit folded
directly in the real network), so the fold cost is not in the timings
except where stated.

Folded tensor: [B, H, W/2, 2C] with channel c' = phase*C + c,
phase = original column parity.
"""

import os
import sys
import threading
import time

threading.Timer(560, lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))


def silu(y):
    return y * jax.nn.sigmoid(y)


def conv(x, w, stride, pad, dn=('NHWC', 'HWIO', 'NHWC')):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(pad, int):
        pad = [(pad, pad)] * 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad, dimension_numbers=dn)


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
    print('{:46s}: {:7.2f} ms  {:6.1f} TFLOP/s'.format(
        name, dt * 1000, flops / dt / 1e12), flush=True)
    del outs, out
    return dt


# ---------- 1x1 64->64 alternatives (worst offender: 12.8ms, 4.2 TF/s)
x64 = mk((B, 320, 320, 64))
w64 = mk((64, 64))
fl = B * 320 * 320 * 64 * 64 * 2


def one_by_one_flat(x, w):
    b, h, wd, c = x.shape
    y = x.reshape(b * h * wd, c) @ w
    return silu(y).reshape(b, h, wd, -1)


bench('1x1 64->64 flat matmul', one_by_one_flat, (x64, w64), fl)

xf = mk((B, 320, 160, 128))  # folded form of the same tensor
wbd = jax.jit(lambda w: jnp.block(
    [[w, jnp.zeros_like(w)], [jnp.zeros_like(w), w]]))(w64)


def one_by_one_folded(x, w):
    b, h, wd, c = x.shape
    y = x.reshape(b * h * wd, c) @ w
    return silu(y).reshape(b, h, wd, -1)


bench('1x1 64->64 folded blockdiag matmul', one_by_one_folded,
      (xf, wbd), fl * 2)

# NCHW layout probe
xc = mk((B, 64, 320, 320))
w64c = mk((1, 1, 64, 64))
bench('1x1 64->64 NCHW', lambda x, w: silu(conv(
    x, w, 1, 0, dn=('NCHW', 'HWIO', 'NCHW'))), (xc, w64c), fl)

# ---------- 3x3 64->64 alternatives (16.2ms, 29.8 TF/s)
w3 = mk((3, 3, 64, 64))
fl3 = B * 320 * 320 * 64 * 64 * 9 * 2

# Folded structured kernel: [3, 2, 128, 128]
# out phase 0 (even col 2w'): taps orig cols 2w'-1 (kx'=-1 ph1),
#   2w' (kx'=0 ph0), 2w'+1 (kx'=0 ph1)
# out phase 1 (odd col 2w'+1): taps 2w' (kx'=0 ph0), 2w'+1 (kx'=0 ph1),
#   2w'+2 (kx'=+1 ph0)
def fold_3x3_weights(w):
    """[3,3,C,C] -> [3,3,2C,2C] folded kernel (kx'=0 at index 1)."""
    c = w.shape[2]
    wf = jnp.zeros((3, 3, 2 * c, 2 * c), w.dtype)
    # output phase 0 = out channels 0:c
    wf = wf.at[:, 0, c:2 * c, 0:c].set(w[:, 0])   # col 2w'-1 = ph1 of w'-1
    wf = wf.at[:, 1, 0:c, 0:c].set(w[:, 1])       # col 2w'   = ph0 of w'
    wf = wf.at[:, 1, c:2 * c, 0:c].set(w[:, 2])   # col 2w'+1 = ph1 of w'
    # output phase 1 = out channels c:2c
    wf = wf.at[:, 1, 0:c, c:2 * c].set(w[:, 0])   # col 2w'   = ph0 of w'
    wf = wf.at[:, 1, c:2 * c, c:2 * c].set(w[:, 1])  # col 2w'+1 = ph1 of w'
    wf = wf.at[:, 2, 0:c, c:2 * c].set(w[:, 2])   # col 2w'+2 = ph0 of w'+1
    return wf


w3f = jax.jit(fold_3x3_weights)(w3)
bench('3x3 64->64 folded [3,3,128,128]',
      lambda x, w: silu(conv(x, w, 1, 1)), (xf, w3f), fl3 * 2)

# sanity reference: plain for comparison in this process
bench('3x3 64->64 plain (ref)', lambda x, w: silu(conv(x, w, 1, 1)),
      (x64, w3), fl3)

# ---------- l0 folded: fold input by 4 -> [B,1280,320,12];
# kernel [6,3] s(2,1) 12->128 structured; out folded [B,640,320,128]
x0u = jax.device_put(np.random.RandomState(0).randint(
    0, 255, (B, 1280, 1280, 3), dtype=np.uint8))
_ = np.asarray(jax.device_get(x0u[:1, :1, :1, 0]))
w0 = mk((6, 6, 3, 64))
fl0 = B * 640 * 640 * 64 * 108 * 2


def fold_l0_weights(w):
    """[6,6,3,64] -> [6,3,12,128]: out ph p (col 2w'+p) tap orig col
    4w'+2p+kx-2 for kx in 0..5 -> folded col w'+(2p+kx-2)//4, subphase
    (2p+kx-2)%4."""
    wf = jnp.zeros((6, 3, 12, 128), w.dtype)
    for p in (0, 1):
        for kx in range(6):
            t = 2 * p + kx - 2
            fc = t // 4 + 1   # folded kx' index (pad 1 left)
            sp = t % 4
            wf = wf.at[:, fc, 3 * sp:3 * sp + 3, 64 * p:64 * p + 64].add(
                w[:, kx])
    return wf


w0f = jax.jit(fold_l0_weights)(w0)


def l0_folded(xu8, wf):
    b, h, wd, c = xu8.shape
    x = xu8.reshape(b, h, wd // 4, 12).astype(jnp.bfloat16) / \
        jnp.bfloat16(255.0)
    y = conv(x, wf, (2, 1), [(2, 2), (1, 1)])
    return silu(y)


bench('l0 folded u8->[6,3]s(2,1) 12->128', l0_folded, (x0u, w0f), fl0 * 2)


def l0_plain_u8(xu8, w):
    x = xu8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
    return silu(conv(x, w, 2, 2))


bench('l0 plain from u8 (ref)', l0_plain_u8, (x0u, w0), fl0)

# ---------- l1 folded: input folded [B,640,320,128], out folded
# [B,320,160,256]; orig 3x3s2 64->128.
x1f = mk((B, 640, 320, 128))
w1 = mk((3, 3, 64, 128))
fl1 = B * 320 * 320 * 128 * 64 * 9 * 2


def fold_l1_weights(w):
    """[3,3,64,128] -> [3,3,256? ] out cols 2w''+p read orig cols
    4w''+2p+kx-1, kx in 0..2 -> folded col (4w''+2p+kx-1)//2 = 2w''+... ;
    folded input cols needed: (2p+kx-1)//2 + 2w'' -> kx' = (2p+kx-1)//2,
    phase (2p+kx-1)%2; stride over folded input = 2."""
    wf = jnp.zeros((3, 3, 2 * 64, 2 * 128), w.dtype)
    for p in (0, 1):
        for kx in range(3):
            t = 2 * p + kx - 1
            fc = (t + 2) // 2 - 1 + 1  # shift so min maps to index 0
            sp = (t + 2) % 2
            wf = wf.at[:, fc, 64 * sp:64 * sp + 64,
                       128 * p:128 * p + 128].add(w[:, kx])
    return wf


w1f = jax.jit(fold_l1_weights)(w1)


def l1_folded(x, wf):
    return silu(conv(x, wf, (2, 2), [(1, 1), (1, 1)]))


bench('l1 folded [3,3]s2 128->256', l1_folded, (x1f, w1f), fl1 * 2)

x1 = mk((B, 640, 640, 64))
bench('l1 plain 3x3s2 64->128 (ref)',
      lambda x, w: silu(conv(x, w, 2, 1)), (x1, w1), fl1)

os._exit(0)
