"""
Folding-tax probe at the REAL l2 geometry (yolov5l6 C3(128,128,n=3),
folded: tensors [b, 240, 160, 2C] at the 960x1280 canvas, int8 chain).

The folded l2 executes ~2x the nominal MACs: fold_1x1 emits dense
block-diagonal kernels ([1,1,2C,2C], half zeros) and fold_3x3_s1 emits
dense [3,3,2C,2C] kernels (half zeros per output phase) — the MXU
multiplies the zeros anyway. A phase-SPLIT execution (slice the two
width-phases apart, run per-phase dense kernels of nominal MAC count,
concat) removes the tax where the per-phase channel count still fills
the 128 lanes (cv12/cv3: 128 in-channels per phase) but drops to 64
lanes inside the bottlenecks — which of tax vs lanes wins is what this
measures, per conv shape:

  cv12 : A dense [1,1,256,256] on [..,256]   vs B 2x [1,1,128,128]
  mcv2 : C dense [3,3,128,128] on [..,128]   vs D per-out-phase
         conv(p0[..,64],[3,1,64,64]) + conv(p1,[3,2,64,64]) etc.
  mcv1 : E dense [1,1,128,128]               vs F 2x [1,1,64,64]
  boundary: int8 slice+concat at 128-channel granularity

plus bitwise-correctness of each split vs its dense form (identical i32
MAC terms + identical epilogue => identical int8 outputs).

Run alone. Self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1100')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

B = int(os.environ.get('EXP_B', '64'))
H, WF = 240, 160
N_IT = int(os.environ.get('EXP_N', '10'))

rng = np.random.RandomState(0)
X_SCALE = np.float32(0.02)
Y_SCALE = np.float32(0.025)


def epilogue(y_i32, w_scale_v, bias_v):
    y = y_i32.astype(jnp.float32) * (w_scale_v * X_SCALE) + bias_v
    y = y * jax.nn.sigmoid(y)
    return jnp.clip(jnp.round(y / Y_SCALE), -127, 127).astype(jnp.int8)


def conv(x, w, pads, strides=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=strides, padding=pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)


def scales(c):
    return (jnp.asarray(rng.uniform(1e-4, 2e-4, (c,)).astype(np.float32)),
            jnp.asarray(rng.uniform(-0.05, 0.05, (c,)).astype(np.float32)))


def dup(v):
    return jnp.concatenate([v, v])


# ---- cv12-style 1x1: ci=128 per phase, 2ch out per phase (y1|y2) ----
CI, CH = 128, 64
x256 = jax.device_put(jnp.asarray(
    rng.randint(-127, 128, (B, H, WF, 2 * CI)).astype(np.int8)))
w1 = rng.randint(-64, 64, (1, 1, CI, CH)).astype(np.int8)
w2 = rng.randint(-64, 64, (1, 1, CI, CH)).astype(np.int8)
# dense folded cv12: [1,1,2ci,4ch], output [p0y1|p1y1|p0y2|p1y2]
w12 = np.zeros((1, 1, 2 * CI, 4 * CH), np.int8)
for p in (0, 1):
    w12[0, 0, p * CI:(p + 1) * CI, p * CH:(p + 1) * CH] = w1[0, 0]
    w12[0, 0, p * CI:(p + 1) * CI,
        2 * CH + p * CH:2 * CH + (p + 1) * CH] = w2[0, 0]
ws1, b1 = scales(CH)
ws2, b2 = scales(CH)
ws12 = jnp.concatenate([ws1, ws1, ws2, ws2])
b12 = jnp.concatenate([b1, b1, b2, b2])
# split kernel per phase: [1,1,ci,2ch] = [w1 | w2]
w12p = np.concatenate([w1, w2], axis=3)
ws12p = jnp.concatenate([ws1, ws2])
b12p = jnp.concatenate([b1, b2])


def cv12_dense(x):
    return epilogue(conv(x, w12, [(0, 0), (0, 0)]), ws12, b12)


def cv12_split(x):
    o0 = epilogue(conv(x[..., :CI], w12p, [(0, 0), (0, 0)]), ws12p, b12p)
    o1 = epilogue(conv(x[..., CI:], w12p, [(0, 0), (0, 0)]), ws12p, b12p)
    # back to the folded channel layout [p0y1|p1y1|p0y2|p1y2]
    return jnp.concatenate([o0[..., :CH], o1[..., :CH],
                            o0[..., CH:], o1[..., CH:]], axis=-1)


# ---- bottleneck 3x3: C=64 per phase, folded [3,3,128,128] ----
CB = 64
x128 = jax.device_put(jnp.asarray(
    rng.randint(-127, 128, (B, H, WF, 2 * CB)).astype(np.int8)))
w33 = rng.randint(-64, 64, (3, 3, CB, CB)).astype(np.int8)
wf33 = np.zeros((3, 3, 2 * CB, 2 * CB), np.int8)
wf33[:, 0, CB:2 * CB, 0:CB] += w33[:, 0]
wf33[:, 1, 0:CB, 0:CB] += w33[:, 1]
wf33[:, 1, CB:2 * CB, 0:CB] += w33[:, 2]
wf33[:, 1, 0:CB, CB:2 * CB] += w33[:, 0]
wf33[:, 1, CB:2 * CB, CB:2 * CB] += w33[:, 1]
wf33[:, 2, 0:CB, CB:2 * CB] += w33[:, 2]
wsb, bb = scales(CB)
w02 = np.stack([w33[:, 0], w33[:, 2]], axis=1)


def mcv2_dense(x):
    return epilogue(conv(x, wf33, [(1, 1), (1, 1)]), dup(wsb), dup(bb))


def mcv2_split(x):
    p0, p1 = x[..., :CB], x[..., CB:]
    y0 = conv(p0, w33[:, 1:2], [(1, 1), (0, 0)]) + \
        conv(p1, w02, [(1, 1), (1, 0)])
    y1 = conv(p1, w33[:, 1:2], [(1, 1), (0, 0)]) + \
        conv(p0, w02, [(1, 1), (0, 1)])
    return jnp.concatenate([epilogue(y0, wsb, bb),
                            epilogue(y1, wsb, bb)], axis=-1)


# ---- bottleneck 1x1: block-diag [1,1,128,128] vs 2x [1,1,64,64] ----
w11 = rng.randint(-64, 64, (1, 1, CB, CB)).astype(np.int8)
wf11 = np.zeros((1, 1, 2 * CB, 2 * CB), np.int8)
wf11[0, 0, 0:CB, 0:CB] = w11[0, 0]
wf11[0, 0, CB:2 * CB, CB:2 * CB] = w11[0, 0]


def mcv1_dense(x):
    return epilogue(conv(x, wf11, [(0, 0), (0, 0)]), dup(wsb), dup(bb))


def mcv1_split(x):
    return jnp.concatenate(
        [epilogue(conv(x[..., :CB], w11, [(0, 0), (0, 0)]), wsb, bb),
         epilogue(conv(x[..., CB:], w11, [(0, 0), (0, 0)]), wsb, bb)],
        axis=-1)


def boundary(x):
    p0 = x[..., :CI] + jnp.int8(1)
    p1 = x[..., CI:] + jnp.int8(1)
    return jnp.concatenate([p0, p1], axis=-1)


print('devices:', jax.devices(), flush=True)

cases = [
    ('cv12_dense', cv12_dense, x256), ('cv12_split', cv12_split, x256),
    ('mcv2_dense', mcv2_dense, x128), ('mcv2_split', mcv2_split, x128),
    ('mcv1_dense', mcv1_dense, x128), ('mcv1_split', mcv1_split, x128),
    ('boundary', boundary, x256),
]
fns, outs = {}, {}
for name, f, x in cases:
    jf = jax.jit(f)
    t0 = time.time()
    out = jf(x)
    out.block_until_ready()
    print('{}: compile+first {:.1f}s'.format(name, time.time() - t0),
          flush=True)
    fns[name] = (jf, x)
    outs[name] = np.asarray(jax.device_get(out))

for a, b in (('cv12_split', 'cv12_dense'), ('mcv2_split', 'mcv2_dense'),
             ('mcv1_split', 'mcv1_dense')):
    print('{} == {} (bitwise): {}'.format(
        a, b, np.array_equal(outs[a], outs[b])), flush=True)

for name, (jf, x) in fns.items():
    t0 = time.time()
    rs = [jf(x) for _ in range(N_IT)]
    rs[-1].block_until_ready()
    dt = (time.time() - t0) / N_IT * 1000
    print('{:11s}: {:7.2f} ms'.format(name, dt), flush=True)

os._exit(0)
