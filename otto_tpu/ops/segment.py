"""Sort-based segment (groupby) primitives.

Every DataFrame groupby / window-rank / join in the reference pipeline
(reference: model/count_co_events.py:60-77 groupby-count,
model/retrieve.py:44-47 ordinal rank over aid, model/count_popularity.py:61-76
rank over cluster, ...) becomes one of the primitives here:

  groupby-sum        -> multi-key stable sort + boundary detection + segment_sum
  rank(.., 'ordinal')-> stable sort + (position - segment_start)
  top-k per group    -> rank + scatter into a dense [groups, k] table
  join on key        -> dense table gather (keys are small ints: aid/session)

All shapes are static; invalid lanes carry the SENTINEL key and sort to the
end. This is the TPU-idiomatic "DataFrame": XLA's bitonic sort saturates HBM
bandwidth and the scatters/gathers stay on device.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

SENTINEL = jnp.int32(2**31 - 1)
NEG_SENTINEL = jnp.int32(-(2**31 - 1))


def _shift_right(x: jnp.ndarray, fill) -> jnp.ndarray:
    """x[i-1] with x[-1] := fill, along the last axis."""
    return jnp.concatenate(
        [jnp.full_like(x[..., :1], fill), x[..., :-1]], axis=-1
    )


# ---------------------------------------------------------------------------
# Flat (1-D) groupby-sum over composite int32 keys
# ---------------------------------------------------------------------------
def sort_compress(
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Groupby (k1, k2) -> sum(v). The device-side equivalent of
    `df.groupby(['aid', 'aid_next']).agg(pl.sum('count'))`
    (reference: model/count_co_events.py:168).

    Returns (uk1, uk2, uv, n_unique): unique keys packed at the front in
    ascending (k1, k2) order, padding rows carry SENTINEL keys and uv == 0.
    """
    n = k1.shape[0]
    if valid is not None:
        k1 = jnp.where(valid, k1, SENTINEL)
        k2 = jnp.where(valid, k2, SENTINEL)
        v = jnp.where(valid, v, jnp.zeros_like(v))
    k1s, k2s, vs = lax.sort((k1, k2, v), num_keys=2)
    first = (k1s != _shift_right(k1s, NEG_SENTINEL)) | (
        k2s != _shift_right(k2s, NEG_SENTINEL)
    )
    seg = jnp.cumsum(first) - 1  # 0-based segment id, ascending
    sums = jax.ops.segment_sum(vs, seg, num_segments=n)
    uk1 = jnp.full((n,), SENTINEL, dtype=k1.dtype).at[seg].set(k1s)
    uk2 = jnp.full((n,), SENTINEL, dtype=k2.dtype).at[seg].set(k2s)
    is_pad = uk1 == SENTINEL
    uv = jnp.where(is_pad, jnp.zeros_like(sums), sums)
    n_unique = jnp.sum(first & (k1s != SENTINEL)).astype(jnp.int32)
    return uk1, uk2, uv, n_unique


def sort_compress_multi(
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    values: Tuple[jnp.ndarray, ...],
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Groupby (k1, k2) -> sum of each value column (the multi-aggregate
    groupby, e.g. reference: model/count_popularity.py:61-70)."""
    n = k1.shape[0]
    if valid is not None:
        k1 = jnp.where(valid, k1, SENTINEL)
        k2 = jnp.where(valid, k2, SENTINEL)
        values = tuple(jnp.where(valid, v, jnp.zeros_like(v)) for v in values)
    out = lax.sort((k1, k2) + tuple(values), num_keys=2)
    k1s, k2s, vs = out[0], out[1], out[2:]
    first = (k1s != _shift_right(k1s, NEG_SENTINEL)) | (
        k2s != _shift_right(k2s, NEG_SENTINEL)
    )
    seg = jnp.cumsum(first) - 1
    uk1 = jnp.full((n,), SENTINEL, dtype=k1.dtype).at[seg].set(k1s)
    uk2 = jnp.full((n,), SENTINEL, dtype=k2.dtype).at[seg].set(k2s)
    is_pad = uk1 == SENTINEL
    uvs = []
    for v in vs:
        s = jax.ops.segment_sum(v, seg, num_segments=n)
        uvs.append(jnp.where(is_pad, jnp.zeros_like(s), s))
    n_unique = jnp.sum(first & (k1s != SENTINEL)).astype(jnp.int32)
    return uk1, uk2, tuple(uvs), n_unique


def sort_by_keys(keys: Tuple[jnp.ndarray, ...], values: Tuple[jnp.ndarray, ...]):
    """Stable lexicographic sort of `values` by `keys` (ascending)."""
    out = lax.sort(tuple(keys) + tuple(values), num_keys=len(keys), is_stable=True)
    return out[: len(keys)], out[len(keys):]


def segment_starts(seg_sorted: jnp.ndarray) -> jnp.ndarray:
    """For each element of a sorted segment-id array, the index where its
    segment starts."""
    n = seg_sorted.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = seg_sorted != _shift_right(seg_sorted, NEG_SENTINEL)
    return lax.cummax(jnp.where(first, pos, 0))


def ordinal_rank_desc(
    group: jnp.ndarray,
    value: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1-based ordinal rank of `value` (descending) within each `group`,
    ties broken by original order — the polars
    `pl.col(x).rank('ordinal', reverse=True).over(group)` semantics
    (reference: model/retrieve.py:44, model/count_popularity.py:73).

    Invalid lanes get rank SENTINEL.
    """
    n = group.shape[0]
    if valid is not None:
        group = jnp.where(valid, group, SENTINEL)
    neg_v = -value.astype(jnp.int32)
    perm = jnp.arange(n, dtype=jnp.int32)
    g_s, v_s, perm_s = lax.sort((group, neg_v, perm), num_keys=2, is_stable=True)
    starts = segment_starts(g_s)
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts + 1
    rank = jnp.zeros((n,), jnp.int32).at[perm_s].set(rank_sorted)
    if valid is not None:
        rank = jnp.where(valid, rank, SENTINEL)
    return rank


def ordinal_rank_asc(
    group: jnp.ndarray,
    value: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1-based ascending ordinal rank within group (reference:
    model/w2vec_aids.py:170 rank of distance)."""
    v = value.astype(jnp.int32)
    return ordinal_rank_desc(group, -v, valid)


# ---------------------------------------------------------------------------
# Dense top-N tables (the TPU replacement for "join on (aid, aid_next)")
# ---------------------------------------------------------------------------
def build_topn_tables(
    key: jnp.ndarray,
    neighbor: jnp.ndarray,
    values: Tuple[jnp.ndarray, ...],
    n_keys: int,
    n_top: int,
    order_by: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Scatter a sparse (key, neighbor, *values) relation into dense
    [n_keys, n_top] tables ordered by `order_by` desc (default: values[0]).

    This materialises the reference's "keep rank <= first_n neighbours per
    aid" (reference: model/retrieve.py:44-47) as a gatherable dense table:
    lookup of all top-N neighbours of an aid is then a single row gather.

    Returns (neighbor_table [n_keys, n_top] int32 (-1 pad), value_tables).
    """
    order = order_by if order_by is not None else values[0]
    valid = key != SENTINEL
    rank = ordinal_rank_desc(key, order, valid)  # 1-based
    slot = rank - 1
    # scatter with mode='drop': slot >= n_top or invalid (SENTINEL key) dropped
    key_c = jnp.where(valid, key, n_keys)  # out of bounds -> dropped
    nb_table = jnp.full((n_keys, n_top), -1, jnp.int32).at[key_c, slot].set(
        neighbor, mode="drop"
    )
    val_tables = tuple(
        jnp.zeros((n_keys, n_top), v.dtype).at[key_c, slot].set(v, mode="drop")
        for v in values
    )
    return nb_table, val_tables


# ---------------------------------------------------------------------------
# Row-wise (per-session) ops over padded [S, C] tensors
# ---------------------------------------------------------------------------
def rowwise_sort(keys: Tuple[jnp.ndarray, ...], values: Tuple[jnp.ndarray, ...] = ()):
    """Stable sort along the last axis by lexicographic keys."""
    out = lax.sort(
        tuple(keys) + tuple(values), dimension=-1, num_keys=len(keys), is_stable=True
    )
    return out[: len(keys)], out[len(keys):]


def rowwise_unique_sum(
    key: jnp.ndarray, values: Tuple[jnp.ndarray, ...]
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Per row: groupby key -> sum(values). Keys must carry SENTINEL for
    invalid lanes. Returns (unique_keys [S,C] SENTINEL-padded at the back,
    summed values, n_unique [S]).

    The per-session dedup + aggregation at the heart of retrieval
    (reference: model/retrieve.py:391-393 groupby (session, aid_next)).
    """
    S, C = key.shape
    (ks,), vs = rowwise_sort((key,), values)
    first = ks != _shift_right(ks, NEG_SENTINEL)
    seg = jnp.cumsum(first, axis=-1) - 1  # per-row segment ids, 0-based
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, C))
    uk = jnp.full((S, C), SENTINEL, jnp.int32).at[rows, seg].set(ks)
    uvs = tuple(
        jnp.zeros((S, C), v.dtype).at[rows, seg].add(v) for v in vs
    )
    is_pad = uk == SENTINEL
    uvs = tuple(jnp.where(is_pad, jnp.zeros_like(v), v) for v in uvs)
    n_unique = jnp.sum(first & (ks != SENTINEL), axis=-1).astype(jnp.int32)
    return uk, uvs, n_unique


def rowwise_segment_reduce(
    key: jnp.ndarray,
    values: Tuple[jnp.ndarray, ...],
    reducers: Tuple[str, ...],
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Per-row groupby with mixed reducers ('sum' | 'max' | 'min' | 'count').

    'min'/'max' ignore lanes whose value equals the respective identity
    (SENTINEL for min, NEG_SENTINEL/0 handled by caller).
    """
    assert len(values) == len(reducers)
    S, C = key.shape
    (ks,), vs = rowwise_sort((key,), values)
    first = ks != _shift_right(ks, NEG_SENTINEL)
    seg = jnp.cumsum(first, axis=-1) - 1
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, C))
    uk = jnp.full((S, C), SENTINEL, jnp.int32).at[rows, seg].set(ks)
    outs = []
    for v, r in zip(vs, reducers):
        if r == "sum" or r == "count":
            o = jnp.zeros((S, C), v.dtype).at[rows, seg].add(v)
        elif r == "max":
            o = jnp.full((S, C), NEG_SENTINEL, v.dtype).at[rows, seg].max(v)
        elif r == "min":
            o = jnp.full((S, C), SENTINEL, v.dtype).at[rows, seg].min(v)
        else:
            raise ValueError(r)
        outs.append(o)
    n_unique = jnp.sum(first & (ks != SENTINEL), axis=-1).astype(jnp.int32)
    return uk, tuple(outs), n_unique


def rowwise_groupby(
    key: jnp.ndarray,
    columns: dict,
) -> Tuple[jnp.ndarray, dict, jnp.ndarray]:
    """Per-row groupby with one sort for any number of columns.

    `columns` maps name -> (array [S, C], reducer), reducer in
    {'sum', 'min', 'max'}. The key is sorted ONCE carrying a permutation;
    every column is then gathered through it (cheap) and scatter-reduced.
    'min'/'max' columns must encode absent lanes as SENTINEL/NEG_SENTINEL
    (or other identity) themselves.

    Returns (unique_key [S, C] SENTINEL back-padded, {name: reduced [S, C]},
    n_unique [S]). Reduced padding lanes carry each reducer's identity.
    """
    S, C = key.shape
    pos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (S, C))
    (ks,), (perm,) = rowwise_sort((key,), (pos,))
    first = ks != _shift_right(ks, NEG_SENTINEL)
    seg = jnp.cumsum(first, axis=-1) - 1
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, C))
    uk = jnp.full((S, C), SENTINEL, jnp.int32).at[rows, seg].set(ks)
    out = {}
    for name, (arr, red) in columns.items():
        a = jnp.take_along_axis(arr, perm, axis=1)
        if red == "sum":
            o = jnp.zeros((S, C), arr.dtype).at[rows, seg].add(a)
        elif red == "max":
            ident = (
                jnp.finfo(arr.dtype).min
                if jnp.issubdtype(arr.dtype, jnp.floating)
                else NEG_SENTINEL
            )
            o = jnp.full((S, C), ident, arr.dtype).at[rows, seg].max(a)
        elif red == "min":
            ident = (
                jnp.finfo(arr.dtype).max
                if jnp.issubdtype(arr.dtype, jnp.floating)
                else SENTINEL
            )
            o = jnp.full((S, C), ident, arr.dtype).at[rows, seg].min(a)
        else:
            raise ValueError(red)
        out[name] = o
    n_unique = jnp.sum(first & (ks != SENTINEL), axis=-1).astype(jnp.int32)
    return uk, out, n_unique


def rowwise_rank_desc(value: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """1-based ordinal rank (desc) along last axis; invalid lanes -> SENTINEL.
    The vectorized `rank('ordinal', reverse=True).over('session')`
    (reference: model/retrieve.py:150-151,173-182)."""
    S, C = value.shape
    neg_v = jnp.where(valid, -value.astype(jnp.int32), SENTINEL)
    pos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (S, C))
    _, (perm_s,) = rowwise_sort((neg_v,), (pos,))
    rank_sorted = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (S, C)) + 1
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, C))
    rank = jnp.zeros((S, C), jnp.int32).at[rows, perm_s].set(rank_sorted)
    return jnp.where(valid, rank, SENTINEL)


def rowwise_rank_asc(value: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return rowwise_rank_desc(jnp.where(valid, -value, value), valid)
