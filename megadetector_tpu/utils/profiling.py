"""
Tracing and per-stage timing.

The reference's observability is wall-clock spans and an images/sec
summary line (megadetector/detection/run_detector.py:802-878,
run_detector_batch.py:2152-2155). This module keeps that surface and adds
TPU-native tracing: stage timers that aggregate mean/std/total, a
throughput meter, and a context manager around jax.profiler for XLA-level
traces viewable in TensorBoard/Perfetto.
"""

import contextlib
import math
import time

from collections import defaultdict


class StageTimer:
    """
    Accumulates wall-clock spans per named stage
    (load / preprocess / device_put / forward / nms / postprocess /
    write). Thread-safe enough for the loader-pool use case (GIL-guarded
    float appends).
    """

    def __init__(self):
        self.samples = defaultdict(list)
        self._start_time = time.time()

    @contextlib.contextmanager
    def time_stage(self, stage):
        t0 = time.time()
        try:
            yield
        finally:
            self.samples[stage].append(time.time() - t0)

    def record(self, stage, seconds):
        self.samples[stage].append(seconds)

    def stats(self):
        """{stage: {'n', 'total', 'mean', 'std'}}."""

        out = {}
        for stage, xs in self.samples.items():
            n = len(xs)
            total = sum(xs)
            mean = total / n
            var = sum((x - mean) ** 2 for x in xs) / n if n > 1 else 0.0
            out[stage] = {'n': n, 'total': total, 'mean': mean,
                          'std': math.sqrt(var)}
        return out

    def summary(self):
        """Human-readable per-stage summary."""

        lines = []
        for stage, s in sorted(self.stats().items(),
                               key=lambda kv: -kv[1]['total']):
            lines.append(
                '{:<14s} n={:<6d} total={:>8.2f}s mean={:>7.1f}ms '
                'std={:>6.1f}ms'.format(
                    stage, s['n'], s['total'], 1000 * s['mean'],
                    1000 * s['std']))
        return '\n'.join(lines)

    def print_summary(self):
        print(self.summary())


class ThroughputMeter:
    """images/sec meter with the reference's summary-line format."""

    def __init__(self):
        self.n_items = 0
        self.t_start = time.time()

    def update(self, n=1):
        self.n_items += n

    @property
    def elapsed(self):
        return time.time() - self.t_start

    @property
    def rate(self):
        e = self.elapsed
        return self.n_items / e if e > 0 else 0.0

    def summary_line(self, label='images'):
        return ('Finished inference for {} {} in {:.1f}s '
                '({:.2f} {}/sec)'.format(
                    self.n_items, label, self.elapsed, self.rate, label))


@contextlib.contextmanager
def xla_trace(log_dir, enabled=True):
    """
    Capture an XLA device trace (host + device timelines) into [log_dir]
    for TensorBoard/Perfetto. No-op when disabled or when the profiler is
    unavailable.
    """

    if not enabled:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        print('Warning: could not start XLA trace: {}'.format(e))
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print('Wrote XLA trace to {}'.format(log_dir))
            except Exception as e:
                print('Warning: could not stop XLA trace: {}'.format(e))


def annotate(name):
    """jax.profiler.TraceAnnotation wrapper (shows up in device traces)."""

    import jax
    return jax.profiler.TraceAnnotation(name)
