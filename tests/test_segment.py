"""Unit tests for sort-based segment ops against NumPy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from otto_tpu.ops import segment as seg

RNG = np.random.default_rng(0)
SENT = int(seg.SENTINEL)


def np_groupby_sum(k1, k2, v):
    out = {}
    for a, b, c in zip(k1, k2, v):
        out[(a, b)] = out.get((a, b), 0) + c
    keys = sorted(out)
    return keys, [out[k] for k in keys]


def test_sort_compress_matches_numpy():
    n = 257
    k1 = RNG.integers(0, 13, n).astype(np.int32)
    k2 = RNG.integers(0, 7, n).astype(np.int32)
    v = RNG.integers(1, 5, n).astype(np.int32)
    valid = RNG.random(n) > 0.2

    uk1, uk2, uv, nu = seg.sort_compress(
        jnp.array(k1), jnp.array(k2), jnp.array(v), jnp.array(valid)
    )
    uk1, uk2, uv, nu = map(np.asarray, (uk1, uk2, uv, int(nu)))

    ref_keys, ref_vals = np_groupby_sum(k1[valid], k2[valid], v[valid])
    assert nu == len(ref_keys)
    got = list(zip(uk1[:nu].tolist(), uk2[:nu].tolist()))
    assert got == ref_keys
    assert uv[:nu].tolist() == ref_vals
    # padding is clean
    assert np.all(uk1[nu:] == SENT)
    assert np.all(uv[nu:] == 0)


def test_sort_compress_all_invalid():
    n = 16
    k = jnp.zeros(n, jnp.int32)
    v = jnp.ones(n, jnp.int32)
    valid = jnp.zeros(n, bool)
    uk1, uk2, uv, nu = seg.sort_compress(k, k, v, valid)
    assert int(nu) == 0
    assert np.all(np.asarray(uv) == 0)


def np_ordinal_rank_desc(group, value, valid):
    """polars rank('ordinal', reverse=True).over(group): ties by input order."""
    n = len(group)
    rank = np.full(n, SENT, np.int64)
    for g in set(group[valid]):
        idx = [i for i in range(n) if valid[i] and group[i] == g]
        order = sorted(idx, key=lambda i: (-value[i], i))
        for r, i in enumerate(order, start=1):
            rank[i] = r
    return rank


def test_ordinal_rank_desc():
    n = 101
    g = RNG.integers(0, 9, n).astype(np.int32)
    v = RNG.integers(0, 4, n).astype(np.int32)  # many ties
    valid = RNG.random(n) > 0.15
    rank = np.asarray(
        seg.ordinal_rank_desc(jnp.array(g), jnp.array(v), jnp.array(valid))
    )
    assert rank.tolist() == np_ordinal_rank_desc(g, v, valid).tolist()


def test_build_topn_tables():
    # aid 0 has neighbours 5(c=9), 6(c=4), 7(c=1); aid 2 has 8(c=3)
    key = jnp.array([0, 0, 0, 2, SENT], jnp.int32)
    nbr = jnp.array([7, 5, 6, 8, 0], jnp.int32)
    cnt = jnp.array([1, 9, 4, 3, 0], jnp.int32)
    nb_t, (cnt_t,) = seg.build_topn_tables(key, nbr, (cnt,), n_keys=3, n_top=2)
    nb_t, cnt_t = np.asarray(nb_t), np.asarray(cnt_t)
    assert nb_t[0].tolist() == [5, 6]  # top-2 by count, 7 dropped
    assert cnt_t[0].tolist() == [9, 4]
    assert nb_t[2].tolist() == [8, -1]
    assert nb_t[1].tolist() == [-1, -1]


def test_rowwise_unique_sum():
    key = jnp.array(
        [[3, 1, 3, SENT], [2, 2, 2, 2]], jnp.int32
    )
    v = jnp.array([[1, 10, 2, 99], [1, 1, 1, 1]], jnp.int32)
    uk, (uv,), nu = seg.rowwise_unique_sum(key, (v,))
    uk, uv, nu = map(np.asarray, (uk, uv, nu))
    assert nu.tolist() == [2, 1]
    assert uk[0, :2].tolist() == [1, 3] and uv[0, :2].tolist() == [10, 3]
    assert uk[1, 0] == 2 and uv[1, 0] == 4
    assert np.all(uk[0, 2:] == SENT) and np.all(uv[0, 2:] == 0)


def test_rowwise_segment_reduce_min_max():
    key = jnp.array([[5, 5, 9, SENT]], jnp.int32)
    vmax = jnp.array([[3, 7, 2, 0]], jnp.int32)
    vmin = jnp.array([[3, 7, 2, 0]], jnp.int32)
    uk, (omax, omin), nu = seg.rowwise_segment_reduce(
        key, (vmax, vmin), ("max", "min")
    )
    assert int(nu[0]) == 2
    assert np.asarray(omax)[0, :2].tolist() == [7, 2]
    assert np.asarray(omin)[0, :2].tolist() == [3, 2]


def test_rowwise_rank_desc():
    v = jnp.array([[5, 9, 9, 1]], jnp.int32)
    valid = jnp.array([[True, True, True, False]])
    rank = np.asarray(seg.rowwise_rank_desc(v, valid))
    assert rank[0].tolist() == [3, 1, 2, SENT]


def test_rowwise_rank_asc():
    v = jnp.array([[5, 9, 2, 1]], jnp.int32)
    valid = jnp.array([[True, True, True, False]])
    rank = np.asarray(seg.rowwise_rank_asc(v, valid))
    assert rank[0].tolist() == [2, 3, 1, SENT]


def test_ordinal_rank_asc_flat():
    g = jnp.array([0, 0, 0, 1], jnp.int32)
    v = jnp.array([30, 10, 20, 5], jnp.int32)
    valid = jnp.ones(4, bool)
    rank = np.asarray(seg.ordinal_rank_asc(g, v, valid))
    assert rank.tolist() == [3, 1, 2, 1]
