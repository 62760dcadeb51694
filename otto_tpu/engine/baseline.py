"""Heuristic co-visitation recommender — the minimum end-to-end slice
(SURVEY.md §7 'Minimum end-to-end slice').

Implements the pre-ranker pipeline shape: session aids (self source,
reference: model/retrieve.py:259) united with co-visitation neighbours
gathered from the dense top-N tables (reference: model/retrieve.py:265),
scored by a recency/type-weighted count heuristic instead of the learned
ranker, then per-session top-20. Directly comparable to the reference's
src_self + src_click_to_click recall rows
(reference: model/eval_retrieved.py:166-173).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.data.batching import PaddedSessions, iter_microbatches, pack_sessions
from otto_tpu.data.schema import Events
from otto_tpu.engine.covis import CoVisTables
from otto_tpu.ops import segment as seg

SENT = seg.SENTINEL


@partial(jax.jit, static_argnums=(4, 5))
def recommend_batch(
    aid: jnp.ndarray,          # [S, L]
    ts: jnp.ndarray,           # [S, L]
    type_: jnp.ndarray,        # [S, L]
    tables: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],  # ((nbr [A,N], cnt [A,N]), ...)
    keep_aids: int,
    top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cand [S, top_k] int32 -1 pad, score [S, top_k])."""
    S, L = aid.shape
    valid = aid >= 0

    # keep last `keep_aids` unique aids per session, with recency/type weight
    type_w = jnp.array([1.0, 3.0, 6.0], jnp.float32)[jnp.clip(type_, 0, 2)]
    key = jnp.where(valid, aid, SENT)
    uk, (u_ts, u_w), _ = seg.rowwise_segment_reduce(
        key,
        (ts, (type_w * 100).astype(jnp.int32)),
        ("max", "max"),
    )
    u_valid = uk != SENT
    # recency rank (1 = most recent)
    order = seg.rowwise_rank_desc(jnp.where(u_valid, u_ts, 0), u_valid)
    keep = u_valid & (order <= keep_aids)
    # compact kept aids to the front, sorted by recency
    sort_key = jnp.where(keep, order, SENT)
    (sk,), (src_aid, src_w) = seg.rowwise_sort((sort_key,), (uk, u_w))
    src_aid = src_aid[:, :keep_aids]                      # [S, A]
    src_w = src_w[:, :keep_aids].astype(jnp.float32) / 100.0
    src_rank = sk[:, :keep_aids]                           # recency order, SENT pad
    src_ok = src_rank != SENT
    # recency decay: weight 1/rank
    w_src = jnp.where(src_ok, src_w / src_rank.astype(jnp.float32), 0.0)

    cands: List[jnp.ndarray] = []
    scores: List[jnp.ndarray] = []

    # self source: strong boost, recency ordered
    cands.append(jnp.where(src_ok, src_aid, -1))
    scores.append(jnp.where(src_ok, 10.0 * w_src, 0.0))

    A_safe = None
    for nbr_t, cnt_t in tables:
        A = nbr_t.shape[0]
        g = jnp.clip(src_aid, 0, A - 1)
        nbr = nbr_t[g]                                    # [S, A_k, N]
        cnt = cnt_t[g].astype(jnp.float32)
        ok = src_ok[:, :, None] & (nbr >= 0)
        # normalize counts within the source aid's list
        cmax = jnp.maximum(jnp.max(cnt, axis=2, keepdims=True), 1.0)
        sc = jnp.where(ok, (cnt / cmax) * w_src[:, :, None], 0.0)
        cands.append(jnp.where(ok, nbr, -1).reshape(S, -1))
        scores.append(sc.reshape(S, -1))

    cand = jnp.concatenate(cands, axis=1)
    score = jnp.concatenate(scores, axis=1)

    # dedup per session, summing scores
    key = jnp.where(cand >= 0, cand, SENT)
    uk, (uscore,), _ = seg.rowwise_segment_reduce(
        key, ((score * 1e4).astype(jnp.int32),), ("sum",)
    )
    u_valid = uk != SENT
    vals, idx = jax.lax.top_k(jnp.where(u_valid, uscore, -1), top_k)
    out_cand = jnp.take_along_axis(uk, idx, axis=1)
    out_cand = jnp.where(vals > -1, out_cand, -1)
    return out_cand, vals.astype(jnp.float32) / 1e4


def recommend(
    test: Events,
    tables: Dict[str, CoVisTables],
    keep_aids: int = 32,
    top_k: int = 20,
    source_names: Tuple[str, ...] = (
        "click_to_click",
        "click_to_cart_or_buy",
        "cart_to_cart",
        "cart_to_buy",
        "buy_to_buy",
    ),
    batch_sessions: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host driver: returns (sessions [N], top-k aids [N, top_k])."""
    dev_tables = tuple(
        (jnp.asarray(tables[n].neighbor), jnp.asarray(tables[n].count))
        for n in source_names
        if n in tables
    )
    out_s, out_a = [], []
    for p in pack_sessions(test):
        for mb in iter_microbatches(p, min(batch_sessions, max(1, p.n_sessions))):
            cand, _ = recommend_batch(
                jnp.asarray(mb.aid),
                jnp.asarray(mb.ts),
                jnp.asarray(mb.type),
                dev_tables,
                keep_aids,
                top_k,
            )
            keep = mb.session >= 0
            out_s.append(mb.session[keep])
            out_a.append(np.asarray(cand)[keep])
    sessions = np.concatenate(out_s)
    aids = np.concatenate(out_a)
    order = np.argsort(sessions)
    return sessions[order], aids[order]
