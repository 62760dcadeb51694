"""Sparse (aid, aid_next) -> count accumulation on device.

The reference's hierarchical merge (per-chunk counts -> RAM-bounded partial
groupby-sums -> prune -> global groupby-sum, reference:
model/count_co_events.py:103-181) becomes a fixed-capacity device-resident
sorted table plus a sort-compress merge step: concat new compressed pairs,
lexicographic sort, segment-sum duplicates, and — on overflow — keep the
top-capacity pairs by count (the analogue of MIN_COUNT_IN_PART pruning +
head(max_rows), reference: model/count_co_events.py:152-158).

All shapes static => one compiled merge program reused for every batch.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from otto_tpu.ops import segment as seg

SENTINEL = seg.SENTINEL


class CountTable(NamedTuple):
    """Sorted sparse count table; rows >= n are padding (aid == SENTINEL)."""

    aid: jnp.ndarray        # [C] int32 ascending (SENTINEL padded)
    aid_next: jnp.ndarray   # [C] int32
    count: jnp.ndarray      # [C] int32
    n: jnp.ndarray          # []  int32 number of valid rows

    @property
    def capacity(self) -> int:
        return self.aid.shape[0]


def empty_table(capacity: int) -> CountTable:
    return CountTable(
        aid=jnp.full((capacity,), SENTINEL, jnp.int32),
        aid_next=jnp.full((capacity,), SENTINEL, jnp.int32),
        count=jnp.zeros((capacity,), jnp.int32),
        n=jnp.zeros((), jnp.int32),
    )


def _keep_topk_by_count(
    aid: jnp.ndarray, aid_next: jnp.ndarray, count: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keep the k largest-count rows, restore key order. Padding (count==0)
    naturally sorts last."""
    neg_c = -count
    c_s, a_s, b_s = lax.sort((neg_c, aid, aid_next), num_keys=1, is_stable=True)
    a_k, b_k, c_k = a_s[:k], b_s[:k], -c_s[:k]
    # restore (aid, aid_next) ascending order; zero-count rows -> SENTINEL
    pad = c_k == 0
    a_k = jnp.where(pad, SENTINEL, a_k)
    b_k = jnp.where(pad, SENTINEL, b_k)
    a_o, b_o, c_o = lax.sort((a_k, b_k, c_k), num_keys=2)
    return a_o, b_o, jnp.where(a_o == SENTINEL, 0, c_o)


def merge_into_impl(
    table: CountTable,
    aid: jnp.ndarray,
    aid_next: jnp.ndarray,
    count: jnp.ndarray,
) -> CountTable:
    """Merge a batch of (possibly compressed) pair counts into the table.

    Batch rows with aid == SENTINEL (or count == 0) are ignored. On overflow
    the smallest-count pairs are dropped (tracked upstream as an explicit
    loss bound, unlike the reference's silent head() truncation)."""
    C = table.capacity
    valid = (aid != SENTINEL) & (count > 0)
    k1 = jnp.concatenate([table.aid, jnp.where(valid, aid, SENTINEL)])
    k2 = jnp.concatenate([table.aid_next, jnp.where(valid, aid_next, SENTINEL)])
    v = jnp.concatenate([table.count, jnp.where(valid, count, 0)])
    uk1, uk2, uv, n_unique = seg.sort_compress(k1, k2, v)

    # overflow truncation costs two extra full sorts; skip it when the
    # merged uniques fit (the common case — uniques sit sorted at the front)
    def trunc(_):
        return _keep_topk_by_count(uk1, uk2, uv, C)

    def no_trunc(_):
        return uk1[:C], uk2[:C], uv[:C]

    a, b, c = lax.cond(n_unique > C, trunc, no_trunc, None)
    n = jnp.minimum(n_unique, C)
    return CountTable(a, b, c, n)


merge_into = jax.jit(merge_into_impl, donate_argnums=(0,))


@partial(jax.jit, static_argnums=(1, 2))
def finalize(table: CountTable, min_count: int, max_pairs: int) -> CountTable:
    """Apply the global prune: count >= min_count, keep top max_pairs by count
    (reference: model/count_co_events.py:171-175)."""
    c = jnp.where(table.count >= min_count, table.count, 0)
    a = jnp.where(c > 0, table.aid, SENTINEL)
    b = jnp.where(c > 0, table.aid_next, SENTINEL)
    k = min(max_pairs, table.capacity)
    a, b, c = _keep_topk_by_count(a, b, c, k)
    n = jnp.sum(c > 0).astype(jnp.int32)
    return CountTable(a, b, c, n)


def compress_pairs(
    aid: jnp.ndarray, aid_next: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map-side combine for a raw pair stream: unique (aid, aid_next) with
    counts. Returns (aid, aid_next, count, n_unique), SENTINEL-padded."""
    ones = jnp.ones_like(aid)
    return seg.sort_compress(aid, aid_next, ones, valid)
