"""
Split the selection segment's real cost (exp_select_cm_profile showed
the full-map score computation is ~free and the 13.7 ms lives in
top_k + winner gather/decode + merge):

  topk_only    : per-level exact lax.top_k on the ranked map, merged
                 final top_k on scores — no row gather, no box decode
  topk_gather  : + the winners' raw-row gather (take_along_axis) and
                 flat-index -> grid decode, no final merge gathers
  select_full  : the production select_topk_candidates (exact) —
                 per-level top_k + merge when first measured; the
                 global-single-top_k restructure afterwards (compare
                 runs in docs/perf-profile.md)
  topk_smallk  : per-level top_k at k=128 (is cost linear in k?)
  sortfull     : full descending sort of the P3 ranked map (upper
                 bound: what a sort-based lowering would cost)

Shapes: b64 @ 960x1280 l6 heads. Run alone; self-exits.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1500')),
                lambda: os._exit(3)).start()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megadetector_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from megadetector_tpu.models import yolov5
from megadetector_tpu.ops.decode import select_topk_candidates

BATCH = int(os.environ.get('EXP_BATCH', '64'))
N_IT = int(os.environ.get('EXP_N', '6'))
R = int(os.environ.get('EXP_R', '8'))
K = 512

config = yolov5.YoloV5Config('yolov5l6', num_classes=3)
NC, NA = 3, 3
NO = 5 + NC
shapes = [(BATCH, 960 // s, 1280 // s, NA * NO) for s in config.strides]
rng = np.random.RandomState(0)
heads = [jax.device_put(jnp.asarray(
    rng.normal(-4.0, 1.5, s).astype(np.float32), jnp.bfloat16))
    for s in shapes]
for h in heads:
    h.block_until_ready()
print('devices:', jax.devices(), flush=True)

anchors = jnp.asarray(config.anchors, jnp.float32)
strides = config.strides


def perturbed(heads, i):
    d = i.astype(jnp.bfloat16) * jnp.bfloat16(0.001)
    return [h + d for h in heads]


def ranked_maps(hs):
    outs = []
    for raw in hs:
        b, h, w, _ = raw.shape
        x = raw.reshape(b, h * w * NA, NO)
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32))
        best = jax.nn.sigmoid(
            jnp.max(x[..., 5:], axis=-1).astype(jnp.float32))
        score = obj * best
        valid = (obj > 0.005) & (score > 0.005)
        outs.append((jnp.where(valid, score, -1.0), x))
    return outs


def scanner(body):
    def run(heads):
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc
    return run


def make_topk_only(k):
    def body(acc, i):
        hs = perturbed(heads, i)
        scores = []
        for ranked, _x in ranked_maps(hs):
            s, _ = jax.lax.top_k(ranked, min(k, ranked.shape[1]))
            scores.append(s)
        merged = jnp.concatenate(scores, axis=1)
        fs, _ = jax.lax.top_k(merged, k)
        return acc + jnp.sum(fs), None
    return scanner(body)


def make_topk_gather():
    def body(acc, i):
        hs = perturbed(heads, i)
        tot = jnp.float32(0)
        for lvl, (ranked, x) in enumerate(ranked_maps(hs)):
            s, idx = jax.lax.top_k(ranked, min(K, ranked.shape[1]))
            rows = jnp.take_along_axis(x, idx[..., None], axis=1)
            rows = jax.nn.sigmoid(rows[..., :4].astype(jnp.float32))
            w = hs[lvl].shape[2]
            a_idx = idx % NA
            cell = idx // NA
            gx = (cell % w).astype(jnp.float32)
            gy = (cell // w).astype(jnp.float32)
            st = jnp.float32(strides[lvl])
            cx = (rows[..., 0] * 2.0 - 0.5 + gx) * st
            cy = (rows[..., 1] * 2.0 - 0.5 + gy) * st
            aw = anchors[lvl][a_idx, 0]
            ah = anchors[lvl][a_idx, 1]
            bw = jnp.square(rows[..., 2] * 2.0) * aw
            bh = jnp.square(rows[..., 3] * 2.0) * ah
            tot = tot + jnp.sum(s) + jnp.sum(cx + cy + bw + bh)
        return acc + tot, None
    return scanner(body)


def make_select_full():
    def body(acc, i):
        hs = perturbed(heads, i)
        c = select_topk_candidates(hs, anchors, strides, NC,
                                   jnp.float32(0.005), K, approx=False)
        return acc + jnp.sum(c['scores']) + jnp.sum(
            c['boxes_cxcywh']), None
    return scanner(body)


def make_sortfull():
    def body(acc, i):
        hs = perturbed(heads, i)
        ranked, _ = ranked_maps(hs)[0]
        s = jax.lax.sort(ranked, dimension=1)
        return acc + jnp.sum(s[:, -K:]), None
    return scanner(body)


programs = [
    ('null', scanner(lambda acc, i: (
        acc + sum(jnp.sum(h.astype(jnp.float32))
                  for h in perturbed(heads, i)), None))),
    ('topk_only', make_topk_only(K)),
    ('topk_smallk', make_topk_only(128)),
    ('topk_gather', make_topk_gather()),
    ('select_full', make_select_full()),
    ('sortfull_p3', make_sortfull()),
]

times = {}
for label, fn in programs:
    jf = jax.jit(fn)
    try:
        t0 = time.time()
        jf(heads).block_until_ready()
        print('{}: compile+first {:.1f}s'.format(
            label, time.time() - t0), flush=True)
    except Exception as e:  # noqa: BLE001
        print('{} FAILED: {}: {}'.format(
            label, type(e).__name__, str(e)[:300]), flush=True)
        continue
    t0 = time.time()
    for _ in range(N_IT):
        out = jf(heads)
    out.block_until_ready()
    dt = (time.time() - t0) / N_IT
    times[label] = dt
    print('{:14s}: {:7.2f} ms/call'.format(label, dt * 1000),
          flush=True)

if 'null' in times:
    base = times['null']
    print('--- per-rep net of null (R={}, b{}) ---'.format(R, BATCH),
          flush=True)
    for label, dt in times.items():
        if label != 'null':
            print('{:14s}: {:7.2f} ms net'.format(
                label, (dt - base) / R * 1000), flush=True)
os._exit(0)
