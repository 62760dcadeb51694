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


def merge_runs_impl(runs: Tuple[CountTable, ...]) -> CountTable:
    """LOSSLESS merge of sorted-or-raw runs: concat + sort + segment-sum.
    Output capacity = sum of input capacities, so no truncation can occur
    (the ladder invariant: a level-k run holds the pairs of arity^k
    microbatches and is sized to fit all of them). The result is left
    UNCOMPACTED (unique keys scattered at segment ends) — the next merge
    re-sorts anyway, and skipping the compaction sort halves the cost."""
    k1 = jnp.concatenate([r.aid for r in runs])
    k2 = jnp.concatenate([r.aid_next for r in runs])
    v = jnp.concatenate([r.count for r in runs])
    uk1, uk2, uv, n = seg.sort_compress_ends(k1, k2, v)
    return CountTable(uk1, uk2, uv, n)


merge_runs = jax.jit(merge_runs_impl)


def merge_runs_compact_impl(runs: Tuple[CountTable, ...]) -> CountTable:
    """merge_runs with front-compaction (uniques packed at the front in key
    order) so the result can be SLICED down to its occupancy — the squeeze
    step that keeps ladder runs dense instead of padded."""
    k1 = jnp.concatenate([r.aid for r in runs])
    k2 = jnp.concatenate([r.aid_next for r in runs])
    v = jnp.concatenate([r.count for r in runs])
    uk1, uk2, uv, n = seg.sort_compress(k1, k2, v)
    return CountTable(uk1, uk2, uv, n)


merge_runs_compact = jax.jit(merge_runs_compact_impl)


def merge_runs_compact_raw_impl(runs: Tuple[CountTable, ...]) -> CountTable:
    """merge_runs_compact specialized to RAW unit-count runs (count == 1 on
    every valid row, exactly as the pair grids emit them): the count column
    is DERIVED from segment lengths after a keys-only sort — the dominant
    level-0 ladder sort carries 2 operands instead of 3, and the value
    scan collapses to one cummax. Semantics: groupby(k1, k2).count
    (reference: model/count_co_events.py:64-72).

    PRECONDITION: every input run must be raw (count == 1 wherever
    aid != SENTINEL); the count column is IGNORED, so aggregated runs
    passed here would get silently wrong counts. CoVisCounter._push
    guarantees this (level-0 entries are always raw emit output); the
    invariant is asserted in tests (tests/test_covis.py)."""
    k1 = jnp.concatenate([r.aid for r in runs])
    k2 = jnp.concatenate([r.aid_next for r in runs])
    k1s, k2s = lax.sort((k1, k2), num_keys=2)
    first = (k1s != seg._shift_right(k1s, seg.NEG_SENTINEL)) | (
        k2s != seg._shift_right(k2s, seg.NEG_SENTINEL)
    )
    n = k1s.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (n,), 0)
    start = lax.cummax(jnp.where(first, pos, 0))
    length = pos - start + 1
    is_end = seg._shift_left(first, True) & (k1s != SENTINEL)
    ck1 = jnp.where(is_end, k1s, SENTINEL)
    ck2 = jnp.where(is_end, k2s, SENTINEL)
    uk1, uk2, uv = lax.sort((ck1, ck2, length), num_keys=2)
    uv = jnp.where(uk1 == SENTINEL, 0, uv)
    n_unique = jnp.sum(is_end).astype(jnp.int32)
    return CountTable(uk1, uk2, uv, n_unique)


merge_runs_compact_raw = jax.jit(merge_runs_compact_raw_impl)


@partial(jax.jit, static_argnums=(1,))
def slice_table(t: CountTable, size: int) -> CountTable:
    """First `size` rows of a COMPACTED table (caller guarantees n <= size)."""
    return CountTable(t.aid[:size], t.aid_next[:size], t.count[:size], t.n)


def _select_by_tag(tag: jnp.ndarray, values: Tuple[int, ...]) -> jnp.ndarray:
    """values[tag] via an arithmetic select chain (a dynamic gather on a
    [C]-long index vector is ~100x off roofline on TPU, a 5-way select is
    free — ARCHITECTURE.md lesson 7)."""
    out = jnp.full(tag.shape, values[0] if values else 0, jnp.int32)
    for i, val in enumerate(values):
        out = jnp.where(tag == i, jnp.int32(val), out)
    return out


@partial(jax.jit, static_argnums=(2, 3))
def merge_bounded_tagged(
    table: CountTable,
    run: CountTable,
    min_count_in_part: Tuple[int, ...],
    stride: int,
) -> CountTable:
    """Merge a run into the bounded top table of the type-tagged keyspace.

    On overflow, first drop pairs below the PER-TYPE partial-aggregate
    min-count (the reference's MIN_COUNT_IN_PART pruning applied to
    RAM-bounded merge slices, reference: model/count_co_events.py:152-158,
    config.py:63), then keep the top-capacity pairs by count."""
    C = table.capacity
    k1 = jnp.concatenate([table.aid, run.aid])
    k2 = jnp.concatenate([table.aid_next, run.aid_next])
    v = jnp.concatenate([table.count, run.count])
    uk1, uk2, uv, n_unique = seg.sort_compress(k1, k2, v)

    def trunc(_):
        tag = jnp.where(uk1 == SENTINEL, 0, uk1 // stride)
        minc = _select_by_tag(tag, min_count_in_part)
        keep = uv >= minc
        a = jnp.where(keep, uk1, SENTINEL)
        b = jnp.where(keep, uk2, SENTINEL)
        c = jnp.where(keep, uv, 0)
        return _keep_topk_by_count(a, b, c, C)

    def no_trunc(_):
        return uk1[:C], uk2[:C], uv[:C]

    a, b, c = lax.cond(n_unique > C, trunc, no_trunc, None)
    n = jnp.sum(c[:C] > 0).astype(jnp.int32)
    return CountTable(a, b, c, n)


@partial(jax.jit, static_argnums=(2, 3))
def extract_tag(table: CountTable, tag: jnp.ndarray, stride: int,
                capacity: int) -> CountTable:
    """Pull one count type's rows out of a tagged table into an untagged
    CountTable of the given capacity (smallest counts dropped on overflow).
    One compiled program reused for all tags (tag is traced)."""
    in_tag = (table.aid != SENTINEL) & (table.aid // stride == tag)
    a = jnp.where(in_tag, table.aid - tag * stride, SENTINEL)
    b = jnp.where(in_tag, table.aid_next, SENTINEL)
    c = jnp.where(in_tag, table.count, 0)
    a, b, c = lax.sort((a, b, c), num_keys=2)
    n_t = jnp.sum(in_tag).astype(jnp.int32)
    C = capacity

    def trunc(_):
        return _keep_topk_by_count(a, b, c, C)

    def no_trunc(_):
        return a[:C], b[:C], c[:C]

    if table.capacity <= C:
        pad = C - table.capacity
        return CountTable(
            jnp.pad(a, (0, pad), constant_values=int(SENTINEL)),
            jnp.pad(b, (0, pad), constant_values=int(SENTINEL)),
            jnp.pad(c, (0, pad)),
            n_t,
        )
    ak, bk, ck = lax.cond(n_t > C, trunc, no_trunc, None)
    return CountTable(ak, bk, ck, jnp.minimum(n_t, C))


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
