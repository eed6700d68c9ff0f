"""
Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware.

Notes for this environment:
- The JAX_PLATFORMS env var can be overridden by site customization that
  registers an external TPU plugin; jax.config.update('jax_platforms', ...)
  after import is authoritative, so that's what we use.
- Tests must never touch the real TPU: it is a single remote-tunneled chip
  and concurrent access from test processes can block indefinitely.
"""

import os

# Must be set before the backend initializes
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = \
        (flags + ' --xla_force_host_platform_device_count=8').strip()

# torch's OpenMP pool and XLA's thread pool fight on single-core hosts
os.environ.setdefault('OMP_NUM_THREADS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
