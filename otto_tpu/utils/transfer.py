"""Device->host transfer helpers for tunneled runtimes.

Measured on the axon-tunneled v5e (2026-08-20): single large device->host
pulls intermittently collapse (256 MB via np.asarray: 233 s; a 32 MB pull:
388 s — retry pathology in the tunnel), while <=16 MB pulls sustain a steady
~30 MB/s and a chunked 256 MB pull (8 MB rows, async-prefetched) completes
in 8.6 s. Host->device pushes are fine (~85 MB/s). fast_pull makes the
chunked path the default for anything past CHUNK bytes.
"""
from __future__ import annotations

import numpy as np

CHUNK_BYTES = 8 << 20  # 8 MB rows: comfortably below the collapse threshold


def fast_pull(x, chunk_bytes: int = CHUNK_BYTES) -> np.ndarray:
    """Pull a device array to host in chunked, async-prefetched slices."""
    import jax.numpy as jnp

    if isinstance(x, np.ndarray):
        return x
    nbytes = x.size * x.dtype.itemsize
    if nbytes <= chunk_bytes:
        return np.asarray(x)
    shape = x.shape
    flat = x.reshape(-1)
    c = max(1, chunk_bytes // x.dtype.itemsize)
    n = flat.shape[0]
    rows = -(-n // c)
    if rows * c != n:
        flat = jnp.pad(flat, (0, rows * c - n))
    grid = flat.reshape(rows, c)
    slices = [grid[i] for i in range(rows)]
    for s in slices:
        try:
            s.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            break
    out = np.concatenate([np.asarray(s) for s in slices])
    return out[:n].reshape(shape)
