"""Co-visitation counting engine (C7).

Drives the TPU counting pipeline end to end:

  events -> dedup -> length-bucketed padded session tensors
         -> masked pair emission [S, L, L]        (otto_tpu.ops.pairs)
         -> map-side sort-compress               (otto_tpu.ops.counts.compress_pairs)
         -> merge into device count tables       (otto_tpu.ops.counts.merge_into)
         -> global prune                         (otto_tpu.ops.counts.finalize)
         -> dense top-N retrieval tables + features

Replaces the reference's polars self-join + hierarchical parquet merge
(reference: model/count_co_events.py:17-181) and the retrieval-time
feature derivation over count files (reference: model/retrieve.py:18-63).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.config import CoVisConfig
from otto_tpu.data.batching import dedup_events, iter_microbatches, pack_sessions
from otto_tpu.data.schema import Events
from otto_tpu.ops import counts as counts_ops
from otto_tpu.ops import pairs as pairs_ops
from otto_tpu.ops import segment as seg
from otto_tpu.ops.counts import CountTable

log = logging.getLogger(__name__)


class CoVisTables(NamedTuple):
    """Dense per-aid top-N retrieval tables for one count type.

    Feature semantics mirror reference: model/retrieve.py:33-61:
      neighbor    [A, N] int32  top-N aid_next by count desc (-1 pad)
      count       [A, N] int32  raw pair count
      count_pop   [A, N] int32  (count-min)/(q9999-min) clipped *10_000
      perc_pop    [A, N] int32  pair's global rank / total pairs *10_000
      count_rel   [A, N] int32  count / max count over the aid * 100
    The per-aid rank feature is implicit: rank == column index + 1.
    """

    neighbor: jnp.ndarray
    count: jnp.ndarray
    count_pop: jnp.ndarray
    perc_pop: jnp.ndarray
    count_rel: jnp.ndarray


@partial(jax.jit, static_argnums=(1, 2))
def build_retrieval_tables(table: CountTable, n_aids: int, first_n: int) -> CoVisTables:
    """Turn a finalized sparse count table into dense gatherable top-N tables
    (the TPU analogue of joining count parquets on (aid, aid_next))."""
    aid, aid_next, count = table.aid, table.aid_next, table.count
    valid = (aid != seg.SENTINEL) & (count > 0)
    total = jnp.maximum(jnp.sum(valid), 1)

    # population stats (reference: model/retrieve.py:33-38)
    big = jnp.int32(2**31 - 1)
    cmin = jnp.min(jnp.where(valid, count, big))
    c_desc = -jax.lax.sort(jnp.where(valid, -count, 0))
    q_idx = jnp.clip((total.astype(jnp.float32) * 1e-4).astype(jnp.int32), 0, count.shape[0] - 1)
    q9999 = c_desc[q_idx]
    denom = jnp.maximum(q9999 - cmin, 1).astype(jnp.float32)
    count_pop = (
        jnp.clip((count - cmin).astype(jnp.float32) / denom, None, 1.0) * 10_000
    ).astype(jnp.int32)

    # global percentile rank by count desc (reference: model/retrieve.py:36-37)
    global_rank = seg.ordinal_rank_desc(jnp.zeros_like(aid), count, valid)
    perc_pop = (
        global_rank.astype(jnp.float32) / total.astype(jnp.float32) * 10_000
    ).astype(jnp.int32)

    # per-aid max for count_rel (reference: model/retrieve.py:45-49)
    max_per_aid = jnp.zeros((n_aids + 1,), jnp.int32).at[
        jnp.where(valid, aid, n_aids)
    ].max(count, mode="drop")
    count_rel = (
        count.astype(jnp.float32)
        / jnp.maximum(max_per_aid[jnp.clip(aid, 0, n_aids)], 1).astype(jnp.float32)
        * 100
    ).astype(jnp.int32)

    key = jnp.where(valid, aid, seg.SENTINEL)
    nbr, (cnt_t, cpop_t, ppop_t, crel_t) = seg.build_topn_tables(
        key,
        aid_next,
        (count, count_pop, jnp.where(valid, perc_pop, 0), count_rel),
        n_keys=n_aids,
        n_top=first_n,
        order_by=count,
    )
    return CoVisTables(nbr, cnt_t, cpop_t, ppop_t, crel_t)


# NOTE: no donate_argnums — donated-buffer programs miss the persistent
# compilation cache on this runtime (measured: identical program recompiled
# 318s on rerun with donation, cached instantly without), and the copy it
# would save is ~1ms of HBM traffic.
@partial(jax.jit, static_argnums=(0,))
def covis_update_step(
    plan: pairs_ops.CoVisPlan,
    tables: Tuple[CountTable, ...],
    aid: jnp.ndarray,
    ts: jnp.ndarray,
    type_: jnp.ndarray,
) -> Tuple[CountTable, ...]:
    """ONE compiled program per bucket shape: emit all 5 pair streams,
    map-side compress each, merge into the donated accumulators. This is the
    whole per-chunk counting stage of the reference
    (model/count_co_events.py:91-100) as a single XLA executable."""
    streams = pairs_ops.emit_pairs(aid, ts, type_, plan)
    new_tables = []
    for (fa, fb, m), table in zip(streams, tables):
        # feed RAW pairs (count=1) straight into the merge: merge_into sorts
        # capacity+P elements regardless, so a pre-compress pass would only
        # add a second full sort of the same size (kept only in the sharded
        # path, where it shrinks the all-to-all exchange volume).
        ones = m.astype(jnp.int32)
        ka = jnp.where(m, fa, counts_ops.SENTINEL)
        kb = jnp.where(m, fb, counts_ops.SENTINEL)
        new_tables.append(counts_ops.merge_into_impl(table, ka, kb, ones))
    return tuple(new_tables)


@jax.jit
def _flush_stage_step(
    tables: Tuple[CountTable, ...], stages: Tuple[CountTable, ...]
) -> Tuple[CountTable, ...]:
    """Merge each staging table's compressed counts into its main table."""
    return tuple(
        counts_ops.merge_into_impl(t, s.aid, s.aid_next, s.count)
        for t, s in zip(tables, stages)
    )


class CoVisCounter:
    """Stateful device-side counter over streamed event chunks.

    Two-level accumulation (the reference's map-side combine made explicit,
    model/count_co_events.py:135-168): microbatch pair streams merge into a
    small STAGING table (cheap sort of stage_capacity + pair_budget rows);
    every `stage_factor` microbatches the staging table is flushed into the
    full-capacity main table. A flush cadence of stage_factor guarantees the
    staging table never overflows (each microbatch adds <= pair_budget
    uniques), so staging is lossless. Amortized cost drops from
    sort(capacity + P) per microbatch to sort((f+1)P) + sort(capacity+fP)/f;
    the auto default f = isqrt(capacity/P) is the minimizer, which only
    kicks in when capacity >> pair budget (the production regime)."""

    def __init__(
        self,
        cfg: CoVisConfig,
        capacity: Optional[int] = None,
        pair_budget: int = 1 << 21,
        bucket_lens: Sequence[int] = (8, 32, 128, 512),
        stage_factor: Optional[int] = None,
    ):
        self.cfg = cfg
        self.plan = pairs_ops.make_plan(cfg)
        self.capacity = capacity or cfg.accumulator_capacity
        self.pair_budget = pair_budget
        self.bucket_lens = tuple(bucket_lens)
        if stage_factor is None:
            stage_factor = max(1, int((self.capacity // pair_budget) ** 0.5))
        self.stage_factor = stage_factor
        self._tables: Tuple[CountTable, ...] = tuple(
            counts_ops.empty_table(self.capacity) for _ in cfg.names
        )
        self._stages: Optional[Tuple[CountTable, ...]] = None
        self._since_flush = 0
        if self.stage_factor > 1:
            self.stage_capacity = self.stage_factor * pair_budget
            self._stages = tuple(
                counts_ops.empty_table(self.stage_capacity) for _ in cfg.names
            )

    @property
    def tables(self) -> Dict[str, CountTable]:
        self._flush()
        return dict(zip(self.cfg.names, self._tables))

    def _flush(self) -> None:
        if self._stages is None or self._since_flush == 0:
            return
        self._tables = _flush_stage_step(self._tables, self._stages)
        self._stages = tuple(
            counts_ops.empty_table(self.stage_capacity) for _ in self.cfg.names
        )
        self._since_flush = 0

    def update(self, events: Events) -> None:
        """Count all co-event pairs in a chunk of sessions. Sessions must be
        complete within the chunk (chunking is by session, as in reference:
        model/count_co_events.py:83)."""
        ev = dedup_events(events)
        for padded in pack_sessions(ev, self.bucket_lens):
            L = padded.max_len
            s_batch = pairs_ops.pair_budget_sessions(L, self.pair_budget)
            for mb in iter_microbatches(padded, s_batch):
                target = self._stages if self._stages is not None else self._tables
                target = covis_update_step(
                    self.plan,
                    target,
                    jnp.asarray(mb.aid),
                    jnp.asarray(mb.ts),
                    jnp.asarray(mb.type),
                )
                if self._stages is not None:
                    self._stages = target
                    self._since_flush += 1
                    if self._since_flush >= self.stage_factor:
                        self._flush()
                else:
                    self._tables = target

    def finalize(self) -> Dict[str, CountTable]:
        """Global prune per count type (reference: model/count_co_events.py:171-175)."""
        out = {}
        for name, t in self.tables.items():
            out[name] = counts_ops.finalize(
                t, self.cfg.min_count_to_save.get(name, 1), self.cfg.max_pairs_to_save
            )
        return out

    def retrieval_tables(self, n_aids: int) -> Dict[str, CoVisTables]:
        final = self.finalize()
        return {
            name: build_retrieval_tables(
                final[name], n_aids, self.cfg.retrieval_first_n[name]
            )
            for name in self.cfg.names
        }


def count_events(
    events: Events,
    cfg: CoVisConfig,
    capacity: Optional[int] = None,
    min_count_override: Optional[int] = None,
) -> Dict[str, CountTable]:
    """One-shot convenience: count an entire event table."""
    counter = CoVisCounter(cfg, capacity=capacity)
    counter.update(events)
    if min_count_override is None:
        return counter.finalize()
    return {
        name: counts_ops.finalize(t, min_count_override, cfg.max_pairs_to_save)
        for name, t in counter.tables.items()
    }
