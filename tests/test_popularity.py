"""Cluster-popularity counting (C12) vs reference semantics
(model/count_popularity.py:61-85)."""
import numpy as np
import pytest

from otto_tpu.config import PopularityConfig
from otto_tpu.data.schema import Events
from otto_tpu.engine.popularity import compute_popularity

DAY = 24 * 60 * 60


def test_popularity_ranks_and_topk():
    # cluster 0: aid 1 clicked 3x, aid 2 clicked 1x; cluster 1: aid 3 ordered
    ev = Events(
        session=np.array([0, 0, 0, 1, 2], np.int32),
        aid=np.array([1, 1, 1, 2, 3], np.int32),
        ts=np.array([10, 20, 30, 40, 50], np.int32),
        type=np.array([0, 0, 0, 0, 2], np.int8),
    )
    session_cluster = np.array([0, 0, 0, 0, 1], np.int32)  # per event
    pop = compute_popularity(ev, session_cluster, 2, 10, PopularityConfig())

    # cluster 0 candidates: aid 1 (rank_clicks 1), aid 2 (rank 2)
    c0 = pop.candidate[0][pop.candidate[0] >= 0].tolist()
    assert set(c0) == {1, 2}
    i1 = c0.index(1)
    assert pop.ranks[0, i1, 0] == 1  # rank_clicks
    # cluster 1: aid 3 top orders
    c1 = pop.candidate[1][pop.candidate[1] >= 0].tolist()
    assert c1 == [3]
    assert pop.ranks[1, 0, 2] == 1  # rank_orders

    # recent (7d) counts == all-time here (all ts recent)
    assert pop.ranks[0, i1, 3] == 1


def test_popularity_7d_window():
    # old click beyond 7d window: counted all-time but not in 7d
    ev = Events(
        session=np.array([0, 1], np.int32),
        aid=np.array([1, 2], np.int32),
        ts=np.array([0, 10 * DAY], np.int32),
        type=np.array([0, 0], np.int8),
    )
    cl = np.zeros(2, np.int32)
    pop = compute_popularity(ev, cl, 1, 5, PopularityConfig())
    cand = pop.candidate[0][pop.candidate[0] >= 0].tolist()
    i1, i2 = cand.index(1), cand.index(2)
    # all-time clicks: both count 1 -> ordinal ranks 1,2 (tie by order)
    assert {pop.ranks[0, i1, 0], pop.ranks[0, i2, 0]} == {1, 2}
    # 7d: only aid 2 clicked recently -> rank 1; aid 1 has zero recent count
    assert pop.ranks[0, i2, 3] == 1
    assert pop.ranks[0, i2, 3] < pop.ranks[0, i1, 3]


def test_aid_rank_lookup():
    ev = Events(
        session=np.array([0, 1], np.int32),
        aid=np.array([4, 4], np.int32),
        ts=np.array([10, 20], np.int32),
        type=np.array([1, 1], np.int8),  # carts
    )
    pop = compute_popularity(ev, np.zeros(2, np.int32), 1, 8, PopularityConfig())
    assert pop.aid_rank[4, 1] == 1       # rank_carts
    assert pop.aid_rank[7, 1] == 999     # absent aid
