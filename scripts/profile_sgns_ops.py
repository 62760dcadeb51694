"""Micro-probe: which primitive dominates the SGNS step at V=1.73M."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, D, N = 1_733_412, 100, 131_072
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
ids_sorted = jnp.sort(ids)
upd = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
u = jnp.asarray(rng.random((N // 8, 8)).astype(np.float32))
cdf = jnp.asarray(np.linspace(0, 1, V).astype(np.float32))


# dependent-SCALAR sync: a full np.asarray(out) would pull the whole array
# through the tunnel (~2.3 s for a [V, D] table at ~0.3 GB/s) and swamp the
# op being measured; reduce on device, fetch 4 bytes.
_checksum = jax.jit(lambda x: x.reshape(-1)[:: max(1, x.size // 256)].sum())


def bench(label, fn, *args, reps=8):
    out = fn(*args)
    _ = float(np.asarray(_checksum(jax.tree.leaves(out)[0])))
    t = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(np.asarray(_checksum(jax.tree.leaves(out)[0])))
    dt = (time.time() - t) / reps
    print(f"{label:34s} {dt*1e3:8.2f} ms", flush=True)


bench("gather [131k,100]", jax.jit(lambda t, i: t[i].sum(0)), table, ids)
bench("scatter-add [131k,100]",
      jax.jit(lambda t, i, u_: t.at[i].add(u_)), table, ids, upd)
bench("scatter-add sorted ids",
      jax.jit(lambda t, i, u_: t.at[i].add(
          u_, indices_are_sorted=True)), table, ids_sorted, upd)
bench("scatter-add sorted+unique-flag",
      jax.jit(lambda t, i, u_: t.at[i].add(
          u_, indices_are_sorted=True, unique_indices=True)),
      table, ids_sorted, upd)
bench("searchsorted [16k x 8] in [V]",
      jax.jit(lambda c, x: jnp.searchsorted(c, x).sum()), cdf, u)
bench("full-table elementwise (x3)",
      jax.jit(lambda t: t * 0.999 - 0.001 * (t * t)), table)
bench("scatter-add 1-D [131k] into [V]",
      jax.jit(lambda a, i, v: a.at[i].add(v)),
      jnp.zeros((V,), jnp.float32), ids, upd[:, 0])
