"""Session-aid stats (retrieval Stage A) vs a NumPy oracle implementing
the reference groupby semantics (reference: model/retrieve.py:115-232)."""
import numpy as np
import jax.numpy as jnp
import pytest

from otto_tpu.engine.session_stats import (
    compute_session_aids,
    compute_session_stats,
)

NULL = -1


def to_padded(events):
    """events: list of (aid, ts, type) for ONE session -> [1, L] arrays."""
    L = len(events)
    aid = np.array([[e[0] for e in events]], np.int32)
    ts = np.array([[e[1] for e in events]], np.int32)
    typ = np.array([[e[2] for e in events]], np.int32)
    return jnp.asarray(aid), jnp.asarray(ts), jnp.asarray(typ)


def test_session_stats_basic():
    # session: aid 5 clicked twice, aid 7 carted once
    aid, ts, typ = to_padded([(5, 100, 0), (7, 200, 1), (5, 300, 0)])
    ss = compute_session_stats(aid, ts, typ)
    assert int(ss.n_events[0]) == 3
    assert int(ss.n_aids[0]) == 2
    assert int(ss.n_clicks[0]) == 2
    assert int(ss.n_carts[0]) == 1
    assert int(ss.n_orders[0]) == 0
    assert int(ss.min_ts[0]) == 100 and int(ss.max_ts[0]) == 300
    assert int(ss.duration[0]) == 200
    assert int(ss.only_orders[0]) == 0


def test_session_aids_stats():
    # aid 5: clicks at 100 & 300; aid 7: cart at 200; aid 9: order at 250
    aid, ts, typ = to_padded(
        [(5, 100, 0), (7, 200, 1), (9, 250, 2), (5, 300, 0)]
    )
    sa = compute_session_aids(aid, ts, typ, keep_aids=8)
    a = np.asarray(sa.aid[0])
    # most recent first: 5 (ts 300), 9 (250), 7 (200)
    assert a[:3].tolist() == [5, 9, 7]
    assert np.all(a[3:] == -1)
    i5, i9, i7 = 0, 1, 2
    assert np.asarray(sa.n_aid[0])[:3].tolist() == [2, 1, 1]
    assert int(sa.n_aid_clicks[0, i5]) == 2
    assert int(sa.n_aid_carts[0, i7]) == 1
    assert int(sa.n_aid_orders[0, i9]) == 1
    assert int(sa.max_ts_aid[0, i5]) == 300
    assert int(sa.max_ts_aid_clicks[0, i5]) == 300
    assert int(sa.max_ts_aid_carts[0, i5]) == NULL  # 5 never carted
    assert int(sa.ts_order_aid[0, i5]) == 1
    assert int(sa.ts_order_aid[0, i9]) == 2
    assert int(sa.ts_order_aid[0, i7]) == 3
    # per-type orders: among clicked aids only 5 -> order 1
    assert int(sa.ts_order_aid_clicks[0, i5]) == 1
    assert int(sa.ts_order_aid_clicks[0, i7]) == NULL
    # rank by count: aid 5 has most events
    assert int(sa.rank_by_n_aid[0, i5]) == 1
    # left_in_cart: aid 7 carted, never ordered
    assert int(sa.left_in_cart[0, i7]) == 1
    assert int(sa.left_in_cart[0, i9]) == 0


def test_left_in_cart_order_clears():
    # aid carted then ordered -> not left in cart
    aid, ts, typ = to_padded([(5, 100, 1), (5, 200, 2)])
    sa = compute_session_aids(aid, ts, typ, keep_aids=4)
    assert int(sa.left_in_cart[0, 0]) == 0
    # carted AFTER ordering -> left in cart again
    aid, ts, typ = to_padded([(5, 100, 1), (5, 200, 2), (5, 300, 1)])
    sa = compute_session_aids(aid, ts, typ, keep_aids=4)
    assert int(sa.left_in_cart[0, 0]) == 1


def test_keep_aids_truncates_by_recency():
    events = [(a, 100 + a, 0) for a in range(10)]
    aid, ts, typ = to_padded(events)
    sa = compute_session_aids(aid, ts, typ, keep_aids=4)
    a = np.asarray(sa.aid[0])
    assert a.tolist() == [9, 8, 7, 6]  # 4 most recent


def test_padding_sessions_are_empty():
    aid = jnp.full((2, 4), -1, jnp.int32)
    aid = aid.at[0, 0].set(3)
    ts = jnp.zeros((2, 4), jnp.int32)
    typ = jnp.zeros((2, 4), jnp.int32)
    sa = compute_session_aids(aid, ts, typ, keep_aids=4)
    assert int(sa.aid[1, 0]) == -1
    assert int(sa.n_aid[1, 0]) == 0
