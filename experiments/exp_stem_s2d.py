"""
Stem attack round 5 (VERDICT item 1): separate the CONV cost from the
INPUT-RELAYOUT cost for every stem reformulation.

Round 4 falsified four stem reformulations e2e, but each paid an input
relayout inside the timed program (h2's transpose of the [B,960,320,12]
tensor alone is ~2.3 ms at 819 GB/s — the size of its entire measured
e2e loss). If the relayout is the loss, the device letterbox can emit
the folded layout directly (it controls its own output construction)
and the conv comparison becomes honest. This experiment times, at b64
bf16 on the 960x1280 4:3 canvas:

  w4_base     [6,3,12,2C] s(2,1) on [B,960,320,12]   (free view; prod)
  h2_fused    [3,3,24,2C] s(1,1) on transpose-in-program (round-4 form)
  h2_pre      same conv on a PRE-MATERIALIZED [B,480,320,24] input
  s2d2_pre    exact l0 rewrite [3,3,12,C] s1 on [B,480,640,12] (9 taps)
  s2d2_l01    s2d2 l0 + l1 (l1 consumes the normal [H/2,W/2,C] layout
              s2d2 emits, so the pair is the honest comparison)
  w4_l01      w4 l0 + folded l1 (the production pair)
  relayouts   the h2 transpose and s2d2 interleave alone

Timing discipline: ~5.5 ms fixed relay dispatch overhead per program —
every timed program CHAINS the op N_CHAIN times on alternating buffers
so the per-op time is (t_chain - t_null)/N_CHAIN. Run alone (one TPU
process); self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '2400')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops import folding

B = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))
R = int(os.environ.get('EXP_CHAIN', '4'))  # in-program repetitions
H, W = 960, 1280
dtype = jnp.bfloat16

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
params = yolov5.init_params(config, seed=0)
folded = folding.fold_early_params(params, config)          # w4
folded_h2 = folding.fold_early_params(params, config, h2=True)
C0 = np.asarray(params['l0']['w']).shape[-1]
C1 = np.asarray(params['l1']['w']).shape[-1]

print('devices:', jax.devices(), 'C0', C0, 'C1', C1, flush=True)


def bf16(node):
    return {k: jnp.asarray(v, dtype) for k, v in dict(node).items()}


l0_plain = jax.device_put(bf16(params['l0']))
l1_plain = jax.device_put(bf16(params['l1']))
l0_w4 = jax.device_put(bf16(folded['l0']))
l1_w4 = jax.device_put(bf16(folded['l1']))
l0_h2 = jax.device_put(bf16(folded_h2['l0']))

# s2d2 exact rewrite: out(i,j,o) = sum_{dy,dx,c} W[dy,dx,c,o] *
# x[2i-2+dy, 2j-2+dx, c]. With the s2d2 layout X2[i',j',(q,p,c)] =
# x[2i'+q, 2j'+p, c] (q,p in {0,1}), the 6x6 s2 window rooted at
# (2i-2, 2j-2) spans packed cells i-1..i+1, j-1..j+1 exactly:
# dy = 2(di+1)+q - 2 for di in {-1,0,1}, q in {0,1}. Kernel
# W2[di+1, dj+1, (q,p,c), o] = W[2*di+q+... ] — derived below.
w_l0 = np.asarray(params['l0']['w'], np.float32)            # [6,6,3,C]
w2 = np.zeros((3, 3, 12, C0), np.float32)
for di in range(3):
    for q in range(2):
        for dj in range(3):
            for p in range(2):
                # original tap offsets within the 6x6 kernel
                w2[di, dj, (q * 2 + p) * 3:(q * 2 + p) * 3 + 3] = \
                    w_l0[2 * di + q, 2 * dj + p]
l0_s2d = jax.device_put({'w': jnp.asarray(w2, dtype),
                         'b': jnp.asarray(params['l0']['b'], dtype)})


def conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    return y * jax.nn.sigmoid(y)


def chain(fn, x0):
    """Run fn R times with a data dependency so one program carries R
    executions of the op (amortizes the relay dispatch floor)."""

    x = x0
    outs = []
    for i in range(R):
        y = fn(x)
        outs.append(y[0, 0, 0, :2].astype(jnp.float32))
        # re-derive an input-shaped tensor from a scalar so iterations
        # depend on each other without keeping activations alive
        x = x0 + (y[0, 0, 0, 0] * 0).astype(x0.dtype)
    return jnp.stack(outs).sum()


def timeit(label, fn, *args):
    f = jax.jit(fn)
    try:
        out = f(*args)
        _ = np.asarray(jax.device_get(out))
    except Exception as e:  # noqa: BLE001
        print('{:14s}: FAILED {}: {}'.format(label, type(e).__name__,
                                             str(e)[:200]), flush=True)
        return None
    t0 = time.time()
    outs = [f(*args) for _ in range(N_IT)]
    _ = np.asarray(jax.device_get(outs[-1]))
    dt = (time.time() - t0) / N_IT
    print('{:14s}: {:8.3f} ms/iter ({} in-program reps)'.format(
        label, dt * 1000, R), flush=True)
    return dt


rng = np.random.RandomState(0)
seed = rng.randint(0, 255, (B, 64, 64, 3), dtype=np.uint8)
expand = jax.jit(lambda s: jnp.tile(s, (1, H // 64, W // 64, 1)))
images = expand(jax.device_put(seed))
images.block_until_ready()

# Pre-materialized folded inputs (built once, outside the timed region)


@jax.jit
def make_w4(u8):
    x = u8.astype(dtype) / dtype(255.0)
    return x.reshape(B, H, W // 4, 12)


@jax.jit
def make_h2(u8):
    xf = make_w4(u8)
    xf = xf.reshape(B, H // 2, 2, W // 4, 12)
    return xf.transpose(0, 1, 3, 2, 4).reshape(B, H // 2, W // 4, 24)


@jax.jit
def make_s2d2(u8):
    x = u8.astype(dtype) / dtype(255.0)
    x = x.reshape(B, H // 2, 2, W // 2, 2, 3)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 12)


x_w4 = make_w4(images)
x_h2 = make_h2(images)
x_s2d = make_s2d2(images)
for t in (x_w4, x_h2, x_s2d):
    t.block_until_ready()

# Null chain: measures the R-rep harness overhead itself
null = timeit('null', lambda u8: chain(
    lambda x: x[:, :2, :2, :3] * 1.0001, images), images)


def per_op(dt):
    return (dt - null) * 1000 / R if dt is not None else float('nan')


res = {}

res['w4_base'] = timeit('w4_base', lambda x0: chain(
    lambda x: conv(x, l0_w4['w'], l0_w4['b'], (2, 1),
                   ((2, 2), (1, 1))), x0), x_w4)

res['h2_pre'] = timeit('h2_pre', lambda x0: chain(
    lambda x: conv(x, l0_h2['w'], l0_h2['b'], (1, 1),
                   ((1, 1), (1, 1))), x0), x_h2)

res['s2d2_pre'] = timeit('s2d2_pre', lambda x0: chain(
    lambda x: conv(x, l0_s2d['w'], l0_s2d['b'], (1, 1),
                   ((1, 1), (1, 1))), x0), x_s2d)

# Round-4 form: transpose inside the program
res['h2_fused'] = timeit('h2_fused', lambda x0: chain(
    lambda x: conv(
        x.reshape(B, H // 2, 2, W // 4, 12)
        .transpose(0, 1, 3, 2, 4).reshape(B, H // 2, W // 4, 24),
        l0_h2['w'], l0_h2['b'], (1, 1), ((1, 1), (1, 1))), x0), x_w4)

# Relayout-only costs
res['h2_relayout'] = timeit('h2_relayout', lambda x0: chain(
    lambda x: x.reshape(B, H // 2, 2, W // 4, 12)
    .transpose(0, 1, 3, 2, 4).reshape(B, H // 2, W // 4, 24) * 1.0001,
    x0), x_w4)

res['s2d2_relayout'] = timeit('s2d2_relayout', lambda x0: chain(
    lambda x: x.reshape(B, H, W // 2, 6)
    .reshape(B, H // 2, 2, W // 2, 6)
    .transpose(0, 1, 3, 2, 4).reshape(B, H // 2, W // 2, 12) * 1.0001,
    x0), make_w4(images).reshape(B, H, W, 3))

# l0+l1 pairs (the layout a variant emits changes what l1 costs)
res['w4_l01'] = timeit('w4_l01', lambda x0: chain(
    lambda x: conv(
        conv(x, l0_w4['w'], l0_w4['b'], (2, 1), ((2, 2), (1, 1))),
        l1_w4['w'], l1_w4['b'], (2, 2), ((1, 1), (1, 1))), x0), x_w4)

res['s2d2_l01'] = timeit('s2d2_l01', lambda x0: chain(
    lambda x: conv(
        conv(x, l0_s2d['w'], l0_s2d['b'], (1, 1), ((1, 1), (1, 1))),
        l1_plain['w'], l1_plain['b'], (2, 2), ((1, 1), (1, 1))),
    x0), x_s2d)

print('\nper-op times (net of null, /{} reps):'.format(R), flush=True)
for k, v in res.items():
    print('{:14s}: {:8.3f} ms'.format(k, per_op(v)), flush=True)

# Numeric cross-check: s2d2 output == plain l0 output (same MAC set,
# bf16 reduction order differs only by tap enumeration)
plain_l0 = jax.jit(lambda u8: conv(
    u8.astype(dtype) / dtype(255.0), l0_plain['w'], l0_plain['b'],
    (2, 2), ((2, 2), (2, 2))))
s2d_l0 = jax.jit(lambda x: conv(x, l0_s2d['w'], l0_s2d['b'], (1, 1),
                                ((1, 1), (1, 1))))
a = np.asarray(jax.device_get(
    plain_l0(images[:2]).astype(jnp.float32)))
bv = np.asarray(jax.device_get(
    s2d_l0(x_s2d[:2]).astype(jnp.float32)))
print('s2d2 vs plain l0: max |diff| = {:.6f} (bf16 ladder ~1e-2)'
      .format(float(np.abs(a - bv).max())), flush=True)
os._exit(0)
