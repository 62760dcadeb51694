"""Cluster-popularity counting (C12).

Per (cluster, aid): counts of clicks/carts/orders, all-time and last-7-days;
ordinal ranks within cluster (desc, clipped to 999); keep aids whose best
rank <= keep_top_k (reference: model/count_popularity.py:56-85). The pseudo
clustering cl1 (all sessions in one cluster — general popularity,
reference :39-41) is the n_clusters=1 case.

Device shape: one sort_compress_multi over (cluster, aid) keys with six
count columns, then per-cluster ordinal ranks, then scatter into dense
[n_clusters, top_slots] candidate tables for retrieval.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.config import PopularityConfig
from otto_tpu.data.schema import Events
from otto_tpu.ops import segment as seg

N_COUNTS = 6  # clicks, carts, orders, clicks_7d, carts_7d, orders_7d
COUNT_NAMES = ("clicks", "carts", "orders", "clicks_7d", "carts_7d", "orders_7d")


class PopularityTables(NamedTuple):
    """Dense cluster-popularity candidate tables.

    candidate [C, T] int32: aids whose best rank <= keep_top_k, -1 pad.
    ranks     [C, T, 6] int32: the six rank columns (clip 999), aligned with
              candidate (reference output columns rank_{kind}_cl{n},
              model/count_popularity.py:73-77).
    aid_rank  [A, 6] int32: rank lookup for ALL aids (for joining general-
              popularity rank features without adding candidates,
              reference: model/retrieve.py:588-590). 999 when absent.
    """

    candidate: np.ndarray
    ranks: np.ndarray
    aid_rank: np.ndarray


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _popularity_device(
    cluster, aid, type_, ts,
    ts_7d,  # traced scalar: varies per dataset, must not trigger recompiles
    n_clusters: int, n_aids: int, top_slots: int, keep_top_k: int,
    rank_clip: int = 999,
):
    """One compiled program: groupby (cluster, aid) -> 6 counts -> per-
    cluster ordinal ranks -> dense candidate/rank tables."""
    vals = []
    for t in (0, 1, 2):
        vals.append((type_ == t).astype(jnp.int32))
    for t in (0, 1, 2):
        vals.append(((type_ == t) & (ts > ts_7d)).astype(jnp.int32))
    valid = aid >= 0
    uk_cl, uk_aid, counts, _ = seg.sort_compress_multi(
        cluster, aid, tuple(vals), valid
    )

    v = uk_cl != seg.SENTINEL
    ranks = []
    for c in counts:
        r = seg.ordinal_rank_desc(uk_cl, c, v)
        ranks.append(jnp.clip(r, None, rank_clip))
    ranks = jnp.stack(ranks, axis=-1)  # [N, 6]

    best = jnp.min(ranks, axis=-1)
    keep = v & (best <= keep_top_k)

    slot = seg.ordinal_rank_desc(uk_cl, -best, keep) - 1
    cl_c = jnp.where(keep, uk_cl, n_clusters)
    cand = (
        jnp.full((n_clusters, top_slots), -1, jnp.int32)
        .at[cl_c, slot]
        .set(uk_aid, mode="drop")
    )
    rank_t = (
        jnp.full((n_clusters, top_slots, N_COUNTS), rank_clip, jnp.int32)
        .at[cl_c, slot]
        .set(ranks, mode="drop")
    )
    aid_c = jnp.where(v, uk_aid, n_aids)
    aid_rank = (
        jnp.full((n_aids, N_COUNTS), rank_clip, jnp.int32)
        .at[aid_c]
        .set(ranks, mode="drop")
    )
    return cand, rank_t, aid_rank


def compute_popularity(
    events: Events,
    session_cluster: np.ndarray,  # cluster id per event's session, int32
    n_clusters: int,
    n_aids: int,
    cfg: PopularityConfig,
    top_slots: int = 128,
) -> PopularityTables:
    """Host driver. `session_cluster` is per-EVENT cluster assignment
    (gather cluster-of-session on host before the call)."""
    ts_max = int(events.ts.max()) if len(events) else 0
    ts_7d = ts_max - cfg.recent_window

    # pad the event axis to a power of two: the compiled program's shape set
    # must not depend on the exact dataset size (remote compiles cost ~40-80s
    # per shape; the padded lanes carry aid == -1 and are masked out)
    n = len(events.aid)
    n_pad = max(8, 1 << (n - 1).bit_length()) if n else 8
    pad = n_pad - n

    def _p(x, fill):
        x = np.asarray(x, np.int32)
        return np.pad(x, (0, pad), constant_values=fill) if pad else x

    cand, rank_t, aid_rank = _popularity_device(
        jnp.asarray(_p(session_cluster, 0)),
        jnp.asarray(_p(events.aid, -1)),
        jnp.asarray(_p(events.type, 0)),
        jnp.asarray(_p(events.ts, 0)),
        jnp.int32(ts_7d),
        n_clusters,
        n_aids,
        top_slots,
        cfg.keep_top_k,
        cfg.rank_clip,
    )
    return PopularityTables(
        candidate=np.asarray(cand),
        ranks=np.asarray(rank_t),
        aid_rank=np.asarray(aid_rank),
    )
