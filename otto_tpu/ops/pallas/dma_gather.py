"""Pallas DMA row gather: out[i] = table[ids[i]] via per-row async DMA.

NEGATIVE RESULT, kept as measured evidence (2026-08-19, v5e via axon):
one-row-per-DMA with the ids scalar-prefetched (PrefetchScalarGridSpec)
and block_n copies in flight reaches 11.7 GB/s at 72k x 512B rows from a
[2M, 128] f32 table — statistically the SAME as XLA's native gather
(12.1 GB/s). The ~60x-off-roofline row-gather rate is the hardware's
scattered-512B fetch rate (descriptor issue bound), not an XLA
inefficiency, so no gather kernel can fix it: avoiding row gathers by
DATA LAYOUT (sort-compaction transport, dense top-N tables, carry
columns — ARCHITECTURE.md lessons 7/10) is the correct design, and this
module documents why. block_n > ~128 fails to compile (semaphore array
limit); block_n=128 is the sweet spot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, block_n: int):
    base = pl.program_id(0) * block_n
    # launch all row DMAs for this block, then wait — Mosaic tracks each
    # with its own semaphore slot, so the copies overlap
    dmas = []
    for j in range(block_n):
        dma = pltpu.make_async_copy(
            table_ref.at[ids_ref[base + j]],
            out_ref.at[j],
            sems.at[j],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


@functools.partial(jax.jit, static_argnums=(2, 3))
def gather_rows_hbm(
    table: jnp.ndarray,   # [V, D]
    ids: jnp.ndarray,     # [N] int32 in [0, V)
    block_n: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[i, :] = table[ids[i], :]. N is padded to a block_n multiple
    (extra rows gather row 0 and are sliced off)."""
    V, D = table.shape
    N = ids.shape[0]
    Np = (N + block_n - 1) // block_n * block_n
    ids_p = jnp.pad(ids, (0, Np - N))
    ids_p = jnp.clip(ids_p, 0, V - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // block_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_n, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block_n,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, block_n=block_n),
        out_shape=jax.ShapeDtypeStruct((Np, D), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids_p, table)
    return out[:N]
