"""Pallas TPU kernel: single-pass segmented inclusive scan along lanes.

The XLA path (ops/segment.py::segmented_scan) is a Hillis-Steele network:
log2(P) roll+select steps, each a full HBM pass over every value column —
~13 passes at retrieval's P≈8k grid width, and XLA materializes the shifted
operand and the select output per step. This kernel computes the identical
inclusive segmented reduction in ONE pass:

  grid = (S // BS, B)            (stacked-column axis innermost: the
                                  `first` flag block is indexed by the
                                  session block only, so Pallas re-fetches
                                  it once per session block, not per column)
  per block: loop over 128-lane chunks; each chunk does an in-register
  log2(128)-step segmented scan (lane rolls + selects on the VPU) and
  absorbs the running carry from the previous chunk.

HBM traffic: values in + values out + flags once = ~2 passes total, vs ~3
passes *per Hillis-Steele step* for the XLA network.

Semantics match segment.py::segmented_scan(values, reducers, first, axis=-1):
`first` marks segment starts; after the scan the LAST element of each
segment holds the segment's full reduction; sums accumulate only within
segments (no cross-segment i32 overflow).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = 2**31 - 1
_F32_MAX = 3.4028235e38

_LANES = 128


def _identity_const(dtype, red: str):
    if red == "sum":
        return 0
    if jnp.issubdtype(jnp.dtype(dtype), jnp.floating):
        return _F32_MAX if red == "min" else -_F32_MAX
    return _I32_MAX if red == "min" else -_I32_MAX


def _combine(red: str, prev, cur):
    if red == "sum":
        return prev + cur
    if red == "max":
        return jnp.maximum(prev, cur)
    return jnp.minimum(prev, cur)


def _segscan_kernel(first_ref, v_ref, out_ref, *, red: str, n_chunks: int):
    bs = v_ref.shape[1]
    ident = _identity_const(v_ref.dtype, red)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, _LANES), 1)

    def chunk(j, carry):
        sl = pl.ds(j * _LANES, _LANES)
        v = v_ref[0, :, sl]                       # [BS, 128]
        # blocked as i32: Mosaic has no i1 lane rotate ("Rotate with
        # non-32-bit data" is unimplemented on v5e)
        blocked = (first_ref[:, sl] != 0).astype(jnp.int32)
        d = 1
        while d < _LANES:
            # shifted-in lanes past the chunk edge carry the identity, so
            # edge lanes absorb nothing spurious; the edge flag fill must be
            # 0 so `blocked` ends as the OR of REAL segment flags — the
            # exact "do not absorb the previous chunk's carry" mask
            v_sh = jnp.where(lane < d, ident, pltpu.roll(v, d, axis=1))
            b_sh = jnp.where(lane < d, 0, pltpu.roll(blocked, d, axis=1))
            is_b = blocked != 0
            v = jnp.where(is_b, v, _combine(red, v_sh, v))
            blocked = blocked | b_sh
            d *= 2
        # lanes whose window reaches back past the chunk edge absorb carry
        v = jnp.where(blocked != 0, v, _combine(red, carry, v))
        out_ref[0, :, sl] = v
        return v[:, _LANES - 1 :]                 # [BS, 1] running value

    carry0 = jnp.full((bs, 1), ident, v_ref.dtype)
    jax.lax.fori_loop(0, n_chunks, chunk, carry0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def segmented_scan_pallas(
    values: jnp.ndarray,   # [B, S, P] stacked columns, one dtype
    first: jnp.ndarray,    # [S, P] bool/int segment-start flags
    red: str,              # 'sum' | 'min' | 'max'
    block_s: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inclusive segmented scan along the last axis; one HBM pass."""
    B, S, P = values.shape
    Pp = (P + _LANES - 1) // _LANES * _LANES
    Sp = (S + block_s - 1) // block_s * block_s
    ident = _identity_const(values.dtype, red)
    v = jnp.pad(values, ((0, 0), (0, Sp - S), (0, Pp - P)),
                constant_values=ident)
    # padding lanes start their own segments so they never leak into carries
    f = jnp.pad(first.astype(jnp.int32), ((0, Sp - S), (0, Pp - P)),
                constant_values=1)

    kernel = functools.partial(
        _segscan_kernel, red=red, n_chunks=Pp // _LANES
    )
    out = pl.pallas_call(
        kernel,
        grid=(Sp // block_s, B),
        in_specs=[
            pl.BlockSpec((block_s, Pp), lambda si, bi: (si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s, Pp), lambda si, bi: (bi, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_s, Pp), lambda si, bi: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Pp), values.dtype),
        interpret=interpret,
    )(f, v)
    return out[:, :S, :P]
