"""Full retrieval engine (C13): candidate union across sources + feature
semantics on a hand-built scenario, plus label joining."""
import numpy as np
import jax.numpy as jnp
import pytest

from otto_tpu.config import RetrievalConfig
from otto_tpu.data.schema import Events, Labels
from otto_tpu.engine.covis import CoVisTables
from otto_tpu.engine.retrieval import (
    FEATURE_INDEX,
    FEATURE_NAMES,
    RetrievalContext,
    Retriever,
    join_labels,
)

N_AIDS = 32
D = 8


def empty_covis(n_top):
    z = np.zeros((N_AIDS, n_top), np.int32)
    return CoVisTables(
        neighbor=jnp.asarray(np.full((N_AIDS, n_top), -1, np.int32)),
        count=jnp.asarray(z), count_pop=jnp.asarray(z),
        perc_pop=jnp.asarray(z), count_rel=jnp.asarray(z),
    )


def make_ctx():
    # click_to_click: aid 1 -> [2 (count 50), 3 (count 10)]
    c2c = empty_covis(4)
    nbr = np.asarray(c2c.neighbor).copy()
    cnt = np.asarray(c2c.count).copy()
    nbr[1, 0], cnt[1, 0] = 2, 50
    nbr[1, 1], cnt[1, 1] = 3, 10
    c2c = c2c._replace(
        neighbor=jnp.asarray(nbr), count=jnp.asarray(cnt),
        count_pop=jnp.asarray(cnt), perc_pop=jnp.asarray(cnt),
        count_rel=jnp.asarray(cnt),
    )
    covis = (c2c,) + tuple(empty_covis(4) for _ in range(4))

    # w2v_all: aid 1 -> [1 (self, d=0), 4 (d=1.5)]
    knn_nbr = np.full((N_AIDS, 3), -1, np.int32)
    knn_dist = np.zeros((N_AIDS, 3), np.float32)
    knn_nbr[1] = [1, 4, -1]
    knn_dist[1] = [0.0, 1.5, 0.0]
    knn_all = (jnp.asarray(knn_nbr), jnp.asarray(knn_dist))
    knn_12 = (
        jnp.asarray(np.full((N_AIDS, 3), -1, np.int32)),
        jnp.asarray(np.zeros((N_AIDS, 3), np.float32)),
    )

    # cluster popularity: cluster 0 -> aids [9, 2]
    pop_cand = np.full((2, 4), -1, np.int32)
    pop_cand[0] = [9, 2, -1, -1]
    pop_ranks = np.full((2, 4, 6), 999, np.int32)
    pop_ranks[0, 0] = [1, 1, 1, 1, 1, 1]
    pop_ranks[0, 1] = [2, 2, 2, 2, 2, 2]

    cl1 = np.full((N_AIDS, 6), 999, np.int32)
    cl1[2] = [7, 7, 7, 7, 7, 7]

    emb = np.zeros((N_AIDS, D), np.float32)
    emb[1, 0] = 1.0
    emb[2, 0] = 1.0   # cand 2 aligned with session direction
    emb[3, 1] = 1.0   # orthogonal

    return RetrievalContext(
        covis=covis,
        knn_all=knn_all,
        knn_1_2=knn_12,
        pop_cl50_cand=jnp.asarray(pop_cand),
        pop_cl50_ranks=jnp.asarray(pop_ranks),
        pop_cl1_rank=jnp.asarray(cl1),
        aid_emb=jnp.asarray(emb),
    )


@pytest.fixture(scope="module")
def result():
    ctx = make_ctx()
    # one session: clicks aid 1 twice
    test = Events(
        session=np.array([100, 100], np.int32),
        aid=np.array([1, 1], np.int32),
        ts=np.array([1000, 2000], np.int32),
        type=np.array([0, 0], np.int8),
    )
    cfg = RetrievalConfig(max_session_aids=8, max_candidates=16,
                          session_len_buckets=(8,))
    from otto_tpu.engine.retrieval import SessionLookup

    r = Retriever(
        ctx=ctx, cfg=cfg,
        sessions=SessionLookup.from_dicts(
            {100: 0}, {100: np.eye(1, D, 0, dtype=np.float32)[0]}, D
        ),
    )
    batches = r.run(test, batch_sessions=1)
    assert len(batches) == 1
    return batches[0]


def feat(b, name):
    return np.asarray(b.feats)[0, :, FEATURE_INDEX[name]]


def test_candidate_union(result):
    b = result
    cands = set(b.cand[0][b.cand[0] >= 0].tolist())
    # self(1), covis(2, 3), w2v(4), pop(9, 2)
    assert cands == {1, 2, 3, 4, 9}


def test_source_flags(result):
    b = result
    cand = b.cand[0]
    idx = {int(a): i for i, a in enumerate(cand) if a >= 0}
    assert feat(b, "src_self")[idx[1]] == 1
    assert feat(b, "src_click_to_click")[idx[2]] == 1
    assert feat(b, "src_click_to_click")[idx[3]] == 1
    assert feat(b, "src_w2vec_all")[idx[4]] == 1
    assert feat(b, "src_pop_cl50")[idx[9]] == 1
    assert feat(b, "src_pop_cl50")[idx[2]] == 1  # aid 2 also in pop list
    assert feat(b, "src_click_to_click")[idx[9]] == 0
    assert np.all(feat(b, "src_cart_to_cart")[list(idx.values())] == 0)


def test_covis_features(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert feat(b, "click_to_click_count")[idx[2]] == 50
    assert feat(b, "click_to_click_rank")[idx[2]] == 1
    assert feat(b, "click_to_click_count")[idx[3]] == 10
    assert feat(b, "click_to_click_rank")[idx[3]] == 2
    # absent -> -1
    assert feat(b, "click_to_click_count")[idx[9]] == -1
    assert feat(b, "cart_to_cart_count")[idx[2]] == -1


def test_self_features(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert feat(b, "slf_n")[idx[1]] == 2          # clicked twice
    assert feat(b, "slf_n_clicks")[idx[1]] == 2
    assert feat(b, "slf_since_ts")[idx[1]] == 0   # last event is aid 1
    assert feat(b, "slf_n")[idx[9]] == 0
    assert feat(b, "n_uniq_aid")[idx[2]] == 1


def test_session_features(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    for a in (1, 2, 3, 4):
        assert feat(b, "n_events_session")[idx[a]] == 2
        assert feat(b, "n_aids_session")[idx[a]] == 1
        assert feat(b, "duration_session")[idx[a]] == 1000


def test_pop_ranks_and_cl1(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert feat(b, "rank_clicks_cl50")[idx[9]] == 1
    assert feat(b, "rank_clicks_cl50")[idx[2]] == 2
    assert feat(b, "rank_clicks_cl50")[idx[4]] == -1   # not in pop list
    assert feat(b, "rank_clicks_cl1")[idx[2]] == 7
    assert feat(b, "rank_clicks_cl1")[idx[4]] == 999


def test_w2v_features(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert feat(b, "n_w2vec_all")[idx[4]] == 1
    assert feat(b, "rank_w2vec_all")[idx[4]] == 2
    assert abs(feat(b, "dist_w2vec_all")[idx[4]] - 1.5) < 1e-5
    assert feat(b, "n_w2vec_all")[idx[9]] == 0
    assert feat(b, "dist_w2vec_all")[idx[9]] == -1


def test_similarity(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert abs(feat(b, "cos_sim_ses_aid")[idx[2]] - 1.0) < 1e-5
    assert abs(feat(b, "cos_sim_ses_aid")[idx[3]]) < 1e-5
    # aid 9 has a zero embedding -> cos 0, eucl -1
    assert feat(b, "cos_sim_ses_aid")[idx[9]] == 0
    assert feat(b, "eucl_dist_ses_aid")[idx[9]] == -1


def test_ts_order(result):
    b = result
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert feat(b, "ts_order_aid")[idx[1]] == 1
    assert feat(b, "ts_order_aid")[idx[9]] == 999  # pop-only candidate


def test_join_labels(result):
    b = result
    labels = Labels(
        session=np.array([100, 100], np.int32),
        type=np.array([0, 2], np.int8),
        aid=np.array([2, 9], np.int32),
    )
    (tgt,) = join_labels([b], labels)
    idx = {int(a): i for i, a in enumerate(b.cand[0]) if a >= 0}
    assert tgt[0, idx[2], 0] == 1   # click label on candidate 2
    assert tgt[0, idx[2], 1] == 0
    assert tgt[0, idx[9], 2] == 1   # order label on candidate 9
    assert tgt[0, idx[1], 0] == 0


def test_feature_count():
    assert len(FEATURE_NAMES) >= 100  # ~120-feature catalogue parity
    assert len(set(FEATURE_NAMES)) == len(FEATURE_NAMES)


def test_label_keep_bits_program_semantics():
    """Device downsample keep bits (bits 3-5): label bits match the plain
    join program; every positive of a positive session keeps; kept
    negatives per session == min(ratio * n_pos, cap, available negatives);
    nothing keeps on padding or positive-free sessions; deterministic in
    the PRNG key."""
    import jax

    from otto_tpu.engine.retrieval import (
        AID_BITS,
        _label_bits_program,
        _label_keep_bits_program,
    )

    rng = np.random.default_rng(0)
    S, C = 64, 96
    cand = rng.integers(0, 500, (S, C)).astype(np.int32)
    for i in range(S):
        cand[i, rng.integers(10, C):] = -1
    session = np.arange(S, dtype=np.int64) + 1000

    labs = [[], [], []]
    for t in range(3):
        for i in range(0, S, 2 + t):   # leaves some sessions positive-free
            row = cand[i][cand[i] >= 0]
            for a in row[: 1 + (i % 3)]:
                labs[t].append((int(session[i]) << AID_BITS) | int(a))
    ratio, cap = 3, 5
    with jax.enable_x64():
        keys = tuple(
            jnp.asarray(np.sort(np.unique(np.asarray(ls, np.int64))))
            if ls else jnp.asarray(np.asarray([-1], np.int64))
            for ls in labs
        )
        cand_d, sess_d = jnp.asarray(cand), jnp.asarray(session)
        base = np.asarray(_label_bits_program(cand_d, sess_d, *keys))
        bits = np.asarray(_label_keep_bits_program(
            cand_d, sess_d, *keys, jax.random.PRNGKey(7), ratio, cap
        ))
        bits2 = np.asarray(_label_keep_bits_program(
            cand_d, sess_d, *keys, jax.random.PRNGKey(7), ratio, cap
        ))
    np.testing.assert_array_equal(bits, bits2)       # deterministic
    np.testing.assert_array_equal(bits & 7, base)    # label bits unchanged

    valid = cand >= 0
    for t in range(3):
        y = (base >> t) & 1
        keep = (bits >> (3 + t)) & 1
        assert not ((keep == 1) & ~valid).any()
        n_pos = ((y == 1) & valid).sum(1)
        has = n_pos > 0
        kept_pos = (keep == 1) & (y == 1)
        np.testing.assert_array_equal(
            kept_pos, (y == 1) & valid & has[:, None]
        )
        n_neg_avail = (valid & (y == 0)).sum(1)
        want = np.minimum(np.minimum(ratio * n_pos, cap), n_neg_avail) * has
        got = ((keep == 1) & (y == 0)).sum(1)
        np.testing.assert_array_equal(got, want)
