"""
Per-execution relay overhead + effective HBM bandwidth probe.

Finding (2026-08-17): this relay pays ~5.5 ms per program execution
regardless of size (a 64 MB copy times like a 512 MB one); subtracting
it, HBM copy bandwidth is ~900 GB/s (spec). Compare chain DIFFERENCES,
never absolute one-op times, on this host.
"""

import os, sys, threading, time
threading.Timer(540, lambda: os._exit(3)).start()
import jax, jax.numpy as jnp, numpy as np

def bench(name, f, args, nbytes, n=6):
    jf = jax.jit(f)
    out = jf(*args)
    _ = np.asarray(jax.device_get(jnp.ravel(out)[:1]))
    t0 = time.time()
    outs = [jf(*args) for _ in range(n)]
    _ = np.asarray(jax.device_get(jnp.ravel(outs[-1])[:1]))
    dt = (time.time()-t0)/n
    print('%-34s: %7.2f ms  %6.0f GB/s' % (name, dt*1000, nbytes/dt/1e9), flush=True)

k = jax.random.PRNGKey(0)
for mb, shape in [(512, (256, 1024, 1024)), (64, (32, 1024, 1024))]:
    x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16))(k)
    x.block_until_ready()
    # read + write = 2x
    bench('copy+1 bf16 %dMB' % mb, lambda a: a + 1, (x,), 2*mb*1e6*2/2)
    bench('silu bf16 %dMB' % mb, lambda a: a*jax.nn.sigmoid(a), (x,), 2*mb*1e6*2/2)
    del x
# conv-shaped: write-only cost check (w/o sum wrapper)
B=64
x = jax.jit(lambda k: jax.random.normal(k, (B,160,160,256), jnp.bfloat16))(k); x.block_until_ready()
w = jax.jit(lambda k: jax.random.normal(k, (1,1,256,128), jnp.bfloat16))(k); w.block_until_ready()
def c(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1,1), [(0,0)]*2, dimension_numbers=('NHWC','HWIO','NHWC'))
    return y*jax.nn.sigmoid(y)
nb = (64*160*160*256 + 64*160*160*128)*2
bench('1x1 256->128 @160 (no sum)', c, (x, w), nb)
os._exit(0)
