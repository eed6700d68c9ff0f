"""
Accelerator diagnostics: the TPU-native analog of the reference's
utils/gpu_test.py:23-99 (which probes torch/TF GPU availability). Checks
JAX backend health, device inventory, and runs a tiny compiled program.
"""

import sys
import time


def accelerator_test(verbose=True):
    """
    Probe the JAX backend. Returns a dict with platform, device count,
    device kinds, and a smoke-test result; prints a report when verbose.
    """

    result = {'jax_ok': False, 'platform': None, 'n_devices': 0,
              'devices': [], 'smoke_test_ok': False,
              'smoke_test_seconds': None, 'error': None}

    try:
        import jax
        import numpy as np
        result['jax_version'] = jax.__version__
        devices = jax.devices()
        result['jax_ok'] = True
        result['platform'] = devices[0].platform
        result['n_devices'] = len(devices)
        result['devices'] = [str(d) for d in devices]
    except Exception as e:
        result['error'] = str(e)
        if verbose:
            print('JAX initialization failed: {}'.format(e))
        return result

    if verbose:
        print('JAX {} initialized'.format(result['jax_version']))
        print('Platform: {}, {} device(s)'.format(
            result['platform'], result['n_devices']))
        for d in result['devices']:
            print('  ' + d)

    try:
        t0 = time.time()
        x = jax.device_put(np.ones((256, 256), np.float32))
        y = jax.jit(lambda a: (a @ a).sum())(x)
        got = float(y)
        result['smoke_test_seconds'] = time.time() - t0
        result['smoke_test_ok'] = abs(got - 256 * 256 * 256) < 1e-3
        if verbose:
            print('Smoke test {} in {:.2f}s'.format(
                'passed' if result['smoke_test_ok'] else 'FAILED',
                result['smoke_test_seconds']))
    except Exception as e:
        result['error'] = str(e)
        if verbose:
            print('Smoke test failed: {}'.format(e))

    return result


def main():
    result = accelerator_test(verbose=True)
    sys.exit(0 if result['smoke_test_ok'] else 1)


if __name__ == '__main__':
    main()
