"""
VERDICT-r4 item 9 follow-up: the exp_two_stage_profile classifier rates
used device-resident crops; the production classification phase stages
~0.69 MB per 480px crop from host per batch and classify_batch blocks
on device_get per batch, so host->device transfer cannot overlap device
compute. Measure the classifier phase with HOST-staged uint8 crop
batches:
  (a) sync discipline (dispatch -> block, the current classify_batch),
  (b) pipelined discipline (dispatch batch N+1 before fetching N).
The delta is the staging gap a double-buffered consumer recovers.

Run alone; self-exits via watchdog.
"""

import os
import sys
import threading
import time

os.environ.setdefault('OMP_NUM_THREADS', '1')

threading.Timer(int(os.environ.get('EXP_WALL', '1800')),
                lambda: os._exit(3)).start()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from megadetector_tpu.utils.compile_cache import \
        enable_persistent_cache
    enable_persistent_cache()

    from megadetector_tpu.models import efficientnet

    print('platform:', jax.devices()[0].platform, file=sys.stderr)

    clf_config = efficientnet.EfficientNetConfig('efficientnetv2_m',
                                                 num_classes=2000)
    clf_params = jax.device_put(jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16),
        efficientnet.init_params(clf_config, seed=0)))

    def clf_step(params, crops_u8):
        x = crops_u8.astype(jnp.float32) / 255.0
        logits = efficientnet.apply(clf_config, params, x,
                                    dtype=jnp.bfloat16)
        return jax.nn.softmax(logits, axis=-1)

    clf_fn = jax.jit(clf_step)

    rng = np.random.RandomState(0)
    n = 8
    for clf_b in (64, 128):
        # Distinct host batches so the transfer is real every step
        host_batches = [rng.randint(0, 255, (clf_b, 480, 480, 3),
                                    dtype=np.uint8) for _ in range(n)]

        # warm the compile
        out = clf_fn(clf_params, host_batches[0])
        _ = np.asarray(jax.device_get(out[:1, :4]))

        # (a) sync: block on every batch before staging the next
        t0 = time.time()
        for hb in host_batches:
            out = clf_fn(clf_params, hb)
            _ = np.asarray(jax.device_get(out))
        sync_rate = clf_b * n / (time.time() - t0)
        print('host-staged sync b{}: {:.1f} crops/s'.format(
            clf_b, sync_rate), flush=True)

        # (b) pipelined: keep one batch in flight
        t0 = time.time()
        in_flight = []
        for hb in host_batches:
            in_flight.append(clf_fn(clf_params, hb))
            if len(in_flight) > 1:
                _ = np.asarray(jax.device_get(in_flight.pop(0)))
        while in_flight:
            _ = np.asarray(jax.device_get(in_flight.pop(0)))
        pipe_rate = clf_b * n / (time.time() - t0)
        print('host-staged pipelined b{}: {:.1f} crops/s ({:+.1f}%)'
              .format(clf_b, pipe_rate,
                      100.0 * (pipe_rate / sync_rate - 1.0)), flush=True)

        # (c) explicit async device_put ahead of dispatch (stage N+1
        # while N computes even if dispatch itself would serialize)
        t0 = time.time()
        staged = jax.device_put(host_batches[0])
        outs = []
        for i, hb in enumerate(host_batches):
            nxt = (jax.device_put(host_batches[i + 1])
                   if i + 1 < len(host_batches) else None)
            outs.append(clf_fn(clf_params, staged))
            if len(outs) > 1:
                _ = np.asarray(jax.device_get(outs.pop(0)))
            staged = nxt
        while outs:
            _ = np.asarray(jax.device_get(outs.pop(0)))
        stage_rate = clf_b * n / (time.time() - t0)
        print('host-staged put-ahead b{}: {:.1f} crops/s ({:+.1f}%)'
              .format(clf_b, stage_rate,
                      100.0 * (stage_rate / sync_rate - 1.0)), flush=True)


main()
os._exit(0)
