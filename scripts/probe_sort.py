"""Probe: device sort/pull throughput on the real chip — sizes the covis
ladder cost model before launching the reference-scale run."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    return int(np.asarray(x.reshape(-1)[-1]))


@jax.jit
def sort2(k1, k2):
    return lax.sort((k1, k2), num_keys=2)


@jax.jit
def sort3(k1, k2, v):
    return lax.sort((k1, k2, v), num_keys=2)


@jax.jit
def sort1_64(kk):
    return lax.sort(kk)


def bench(fn, args, label, rows):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)  # compile
    t = time.time()
    reps = 3
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    dt = (time.time() - t) / reps
    print(f"{label:28s} {rows/1e6:7.1f}M rows  {dt*1e3:8.1f} ms  "
          f"{rows/dt/1e6:8.1f} Mrows/s")
    return dt


key = jax.random.PRNGKey(0)
for n in (1 << 23, 1 << 25, 1 << 26):
    k1 = jax.random.randint(key, (n,), 0, 9_000_000, jnp.int32)
    k2 = jax.random.randint(key, (n,), 0, 1_800_000, jnp.int32)
    v = jnp.ones((n,), jnp.int32)
    kk = (k1.astype(jnp.int64) << 23) | k2.astype(jnp.int64)
    bench(sort2, (k1, k2), f"sort2 int32 n=2^{n.bit_length()-1}", n)
    bench(sort3, (k1, k2, v), f"sort3 int32 n=2^{n.bit_length()-1}", n)
    bench(sort1_64, (kk,), f"sort1 int64 n=2^{n.bit_length()-1}", n)

# device->host pull rate
from otto_tpu.utils.transfer import fast_pull

for mb in (16, 64, 256):
    x = jnp.ones((mb << 20) // 4, jnp.int32)
    sync(x)
    t = time.time()
    fast_pull(x)
    dt = time.time() - t
    print(f"fast_pull {mb:4d} MB: {dt:6.2f} s  {mb/dt:7.1f} MB/s")
