"""Per-session and per-(session, aid) statistics (Stage A of retrieval).

The dense equivalent of the reference's two groupby passes
(reference: model/retrieve.py:115-135 compute_session_stats and
:138-232 get_session_aid_pairs_unique): from padded session tensors [S, L]
produce per-session scalars and per-unique-aid stat tensors [S, A_k],
compacted to the A_k most recent unique aids (the reference's last-99
truncation, config.py:76-79, tightened to a static shape).

"Null" encoding: absent int stats carry NULL (== -1) after finishing;
intermediate reductions use SENTINEL/NEG_SENTINEL identities.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from otto_tpu.ops import segment as seg

SENT = seg.SENTINEL
NEG_SENT = seg.NEG_SENTINEL
NULL = jnp.int32(-1)
HOUR = 60 * 60


class SessionStats(NamedTuple):
    """Per-session scalars (reference: model/retrieve.py:121-134)."""

    n_events: jnp.ndarray        # [S]
    n_aids: jnp.ndarray          # [S] unique aids
    n_clicks: jnp.ndarray        # [S]
    n_carts: jnp.ndarray         # [S]
    n_orders: jnp.ndarray       # [S]
    min_ts: jnp.ndarray          # [S]
    max_ts: jnp.ndarray          # [S]
    duration: jnp.ndarray        # [S]
    only_orders: jnp.ndarray     # [S] int32 0/1


class SessionAids(NamedTuple):
    """Per kept unique (session, aid) stats [S, A_k]
    (reference: model/retrieve.py:208-230 select list)."""

    aid: jnp.ndarray                 # -1 pad
    n_aid: jnp.ndarray
    n_aid_clicks: jnp.ndarray
    n_aid_carts: jnp.ndarray
    n_aid_orders: jnp.ndarray
    rank_by_n_aid: jnp.ndarray
    rank_by_n_aid_carts: jnp.ndarray
    rank_by_n_aid_orders: jnp.ndarray
    max_ts_aid: jnp.ndarray          # NULL when absent
    max_ts_aid_clicks: jnp.ndarray
    max_ts_aid_carts: jnp.ndarray
    max_ts_aid_orders: jnp.ndarray
    ts_aid_rel_pos_in_session: jnp.ndarray
    ts_order_aid: jnp.ndarray        # 1 = most recent
    ts_order_aid_rel: jnp.ndarray
    ts_order_aid_clicks: jnp.ndarray  # SENT-like NULL -> NULL999 at feature time
    ts_order_aid_carts: jnp.ndarray
    ts_order_aid_orders: jnp.ndarray
    left_in_cart: jnp.ndarray

    @property
    def valid(self) -> jnp.ndarray:
        return self.aid >= 0


def compute_session_stats(aid, ts, type_) -> SessionStats:
    valid = aid >= 0
    n_events = jnp.sum(valid, axis=1).astype(jnp.int32)
    n_clicks = jnp.sum(valid & (type_ == 0), axis=1).astype(jnp.int32)
    n_carts = jnp.sum(valid & (type_ == 1), axis=1).astype(jnp.int32)
    n_orders = jnp.sum(valid & (type_ == 2), axis=1).astype(jnp.int32)
    big = jnp.int32(2**30)
    min_ts = jnp.min(jnp.where(valid, ts, big), axis=1)
    max_ts = jnp.max(jnp.where(valid, ts, -big), axis=1)
    # unique aid count per session via rowwise sort
    key = jnp.where(valid, aid, SENT)
    (ks,), _ = seg.rowwise_sort((key,), ())
    first = (ks != seg._shift_right(ks, NEG_SENT)) & (ks != SENT)
    n_aids = jnp.sum(first, axis=1).astype(jnp.int32)
    only_orders = (
        (n_clicks == 0) & (n_carts == 0) & (n_orders > 0)
    ).astype(jnp.int32)
    return SessionStats(
        n_events, n_aids, n_clicks, n_carts, n_orders,
        min_ts, max_ts, max_ts - min_ts, only_orders,
    )


@partial(jax.jit, static_argnums=(3,))
def compute_session_aids(aid, ts, type_, keep_aids: int) -> SessionAids:
    """[S, L] events -> [S, keep_aids] per-unique-aid stats, most recent
    first (compaction replaces the reference's last-99 filter,
    model/retrieve.py:199-206)."""
    S, L = aid.shape
    valid = aid >= 0
    key = jnp.where(valid, aid, SENT)

    ones = valid.astype(jnp.int32)
    is_c = (valid & (type_ == 0)).astype(jnp.int32)
    is_k = (valid & (type_ == 1)).astype(jnp.int32)
    is_o = (valid & (type_ == 2)).astype(jnp.int32)

    def ts_of(mask):
        return jnp.where(mask.astype(bool), ts, NEG_SENT)

    uk, red, n_u = seg.rowwise_groupby(
        key,
        {
            "n": (ones, "sum"),
            "n_c": (is_c, "sum"),
            "n_k": (is_k, "sum"),
            "n_o": (is_o, "sum"),
            "mt": (jnp.where(valid, ts, NEG_SENT), "max"),
            "mt_c": (ts_of(is_c), "max"),
            "mt_k": (ts_of(is_k), "max"),
            "mt_o": (ts_of(is_o), "max"),
        },
    )
    u_valid = uk != SENT

    # per-type recency orders over the session (reference :150-151,163-169)
    def order_of(mts):
        has = u_valid & (mts != NEG_SENT)
        return seg.rowwise_rank_desc(jnp.where(has, mts, 0), has)

    ts_order = order_of(red["mt"])                  # rank among all unique aids
    ts_order_c = order_of(red["mt_c"])
    ts_order_k = order_of(red["mt_k"])
    ts_order_o = order_of(red["mt_o"])

    rank_n = seg.rowwise_rank_desc(red["n"], u_valid)
    rank_nk = seg.rowwise_rank_desc(red["n_k"], u_valid)
    rank_no = seg.rowwise_rank_desc(red["n_o"], u_valid)

    n_uniq = jnp.maximum(jnp.max(jnp.where(u_valid, ts_order, 0), axis=1), 1)
    ts_order_rel = jnp.where(
        u_valid,
        (ts_order.astype(jnp.float32) / n_uniq[:, None].astype(jnp.float32) * 100)
        .round().astype(jnp.int32),
        SENT,
    )

    # rel pos of the aid's last ts inside the session span (reference :188-196)
    mt = red["mt"]
    min_mt = jnp.min(jnp.where(u_valid, mt, 2**30), axis=1, keepdims=True)
    max_mt = jnp.max(jnp.where(u_valid, mt, -(2**30)), axis=1, keepdims=True)
    span = jnp.maximum(max_mt - min_mt, HOUR).astype(jnp.float32)
    rel_pos = jnp.where(
        u_valid,
        ((max_mt - mt).astype(jnp.float32) / span * 100).round().astype(jnp.int32),
        SENT,
    )

    left_in_cart = jnp.where(
        u_valid
        & (
            ((red["n_k"] > 0) & (red["n_o"] == 0))
            | (
                (red["mt_k"] != NEG_SENT)
                & (red["mt_o"] != NEG_SENT)
                & (red["mt_k"] > red["mt_o"])
            )
        ),
        1,
        0,
    ).astype(jnp.int32)

    # compact: keep most recent `keep_aids` unique aids
    sort_key = jnp.where(u_valid, ts_order, SENT)
    cols = [
        uk, red["n"], red["n_c"], red["n_k"], red["n_o"],
        rank_n, rank_nk, rank_no,
        red["mt"], red["mt_c"], red["mt_k"], red["mt_o"],
        rel_pos, ts_order, ts_order_rel, ts_order_c, ts_order_k, ts_order_o,
        left_in_cart,
    ]
    (sk,), sorted_cols = seg.rowwise_sort((sort_key,), tuple(cols))
    kept = [c[:, :keep_aids] for c in sorted_cols]
    ok = sk[:, :keep_aids] != SENT

    def fin(x, null=NULL, absent=NEG_SENT):
        """replace reducer identities with NULL, mask invalid lanes"""
        x = jnp.where(x == absent, null, x)
        x = jnp.where(x == SENT, null, x)
        return jnp.where(ok, x, null)

    return SessionAids(
        aid=jnp.where(ok, kept[0], -1),
        n_aid=jnp.where(ok, kept[1], 0),
        n_aid_clicks=jnp.where(ok, kept[2], 0),
        n_aid_carts=jnp.where(ok, kept[3], 0),
        n_aid_orders=jnp.where(ok, kept[4], 0),
        rank_by_n_aid=fin(kept[5]),
        rank_by_n_aid_carts=fin(kept[6]),
        rank_by_n_aid_orders=fin(kept[7]),
        max_ts_aid=fin(kept[8]),
        max_ts_aid_clicks=fin(kept[9]),
        max_ts_aid_carts=fin(kept[10]),
        max_ts_aid_orders=fin(kept[11]),
        ts_aid_rel_pos_in_session=fin(kept[12]),
        ts_order_aid=fin(kept[13]),
        ts_order_aid_rel=fin(kept[14]),
        ts_order_aid_clicks=fin(kept[15]),
        ts_order_aid_carts=fin(kept[16]),
        ts_order_aid_orders=fin(kept[17]),
        left_in_cart=jnp.where(ok, kept[18], 0),
    )
