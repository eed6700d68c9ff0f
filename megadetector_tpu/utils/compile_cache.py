"""
Persistent XLA compilation cache.

The production programs (1280px YOLOv5l6 + NMS) take 20-40 s to compile
per (batch, canvas, dtype) on TPU; the persistent cache makes every
process after the first start instantly for shapes it has seen.
Enabled by default by TPUDetector and bench.py; opt out with
MD_COMPILATION_CACHE=0, redirect with MD_COMPILATION_CACHE=<dir>.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'megadetector_tpu', 'xla')

_enabled = False


def enable_persistent_cache(cache_dir=None, min_compile_secs=5.0):
    """
    Point JAX's compilation cache at a persistent directory. Safe to
    call repeatedly; never raises (a broken cache only costs the
    speedup). Returns the directory in use, or None when disabled.
    """

    global _enabled

    env = os.environ.get('MD_COMPILATION_CACHE', '')
    if env == '0':
        return None
    if cache_dir is None:
        cache_dir = env if env not in ('', '1') else _DEFAULT_DIR

    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(min_compile_secs))
        _enabled = True
        return cache_dir
    except Exception:
        return None
