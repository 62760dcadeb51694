"""First-run validation of the Pallas segmented-scan kernel on real TPU:
correctness vs the XLA Hillis-Steele network + per-call timing at
retrieval-like shapes. Run AFTER any long TPU job (single-client claim)."""
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

from otto_tpu.ops import segment as seg
from otto_tpu.ops.pallas.segscan import segmented_scan_pallas

rng = np.random.default_rng(0)
ok = True
for (B, S, P), red in [
    ((6, 256, 3968), "sum"), ((6, 256, 3968), "min"),
    ((3, 512, 8064), "max"), ((1, 64, 1000), "sum"),
]:
    vals = rng.integers(0, 100, (B, S, P)).astype(np.int32)
    first = rng.random((S, P)) < 0.1
    first[:, 0] = True
    want = seg.segmented_scan(
        (jnp.asarray(vals),), (red,), jnp.asarray(first)[None, :, :], axis=2
    )[0]
    got = segmented_scan_pallas(jnp.asarray(vals), jnp.asarray(first), red)
    eq = bool(jnp.all(want == got))
    ok &= eq
    # timing (amortized over reps, dependent-scalar sync)
    def run_p():
        return segmented_scan_pallas(jnp.asarray(vals), jnp.asarray(first), red)
    def run_x():
        return seg.segmented_scan(
            (jnp.asarray(vals),), (red,), jnp.asarray(first)[None], axis=2
        )[0]
    for fn, name in ((run_p, "pallas"), (run_x, "xla")):
        out = fn(); _ = int(np.asarray(out[0, -1, -1]))
        t = time.time()
        for _ in range(8):
            out = fn()
        _ = int(np.asarray(out[0, -1, -1]))
        dt = (time.time() - t) / 8
        print(f"[{B}x{S}x{P} {red}] {name:6s} {dt*1e3:7.2f} ms", flush=True)
    print(f"[{B}x{S}x{P} {red}] equal: {eq}", flush=True)

print("ALL EQUAL" if ok else "MISMATCH", flush=True)
sys.exit(0 if ok else 1)
