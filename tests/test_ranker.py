"""LambdaRank tower: learns a synthetic ranking signal; ndcg metric sanity."""
import numpy as np
import pytest

from otto_tpu.config import RankerConfig
from otto_tpu.models.ranker import (
    Ranker,
    _group_pad,
    ndcg_at_k,
    train_ranker,
)


def make_ranking_data(n_sessions=300, group=20, n_feats=8, seed=0):
    """Feature 0 is predictive of relevance, rest are noise."""
    rng = np.random.default_rng(seed)
    feats, labels, sessions = [], [], []
    for s in range(n_sessions):
        f = rng.normal(size=(group, n_feats)).astype(np.float32)
        # relevance driven by feature 0 with noise
        logit = 2.0 * f[:, 0] + rng.normal(scale=0.5, size=group)
        y = np.zeros(group, np.float32)
        y[np.argmax(logit)] = 1.0
        feats.append(f)
        labels.append(y)
        sessions.append(np.full(group, s, np.int32))
    return (
        np.concatenate(feats),
        np.concatenate(labels),
        np.concatenate(sessions),
    )


def test_group_pad():
    feats = np.arange(10, dtype=np.float32)[:, None]
    labels = np.array([0, 0, 1, 0, 0, 0, 0, 0, 0, 1], np.float32)
    sessions = np.array([1, 1, 1, 2, 2, 2, 2, 2, 2, 2], np.int32)
    fg, lg, mg = _group_pad(feats, labels, sessions, max_group=4)
    assert fg.shape == (2, 4, 1)
    assert mg[0].tolist() == [True, True, True, False]
    # session 2 truncated from 7 rows to 4 but keeps its positive
    assert lg[1].sum() == 1.0


def test_ndcg_at_k():
    scores = np.array([[3.0, 2.0, 1.0]])
    labels = np.array([[1.0, 0.0, 0.0]])
    mask = np.ones((1, 3), bool)
    assert ndcg_at_k(scores, labels, mask, k=3) == 1.0
    scores2 = np.array([[1.0, 3.0, 2.0]])
    # positive at rank 3: dcg = 1/log2(4) = 0.5
    assert abs(ndcg_at_k(scores2, labels, mask, k=3) - 0.5) < 1e-9


def test_ranker_learns_signal():
    feats, labels, sessions = make_ranking_data()
    cfg = RankerConfig(
        hidden_dims=(32, 16), epochs=8, batch_sessions=64, max_group=20,
        learning_rate=1e-2,
    )
    names = tuple(f"f{i}" for i in range(feats.shape[1]))
    ranker = train_ranker(feats, labels, sessions, names, cfg)

    vf, vl, vs = make_ranking_data(seed=99)
    fg, lg, mg = _group_pad(vf, vl, vs, cfg.max_group)
    scores = ranker.predict(fg.reshape(-1, vf.shape[1])).reshape(fg.shape[:2])
    ndcg = ndcg_at_k(scores, lg, mg, k=20)

    # random ranking on 20-candidate groups gives ndcg ~ 0.25-0.3
    assert ndcg > 0.6


def test_ranker_save_load(tmp_path):
    feats, labels, sessions = make_ranking_data(50)
    cfg = RankerConfig(hidden_dims=(8,), epochs=1, batch_sessions=16, max_group=20)
    names = tuple(f"f{i}" for i in range(feats.shape[1]))
    ranker = train_ranker(feats, labels, sessions, names, cfg)
    p = str(tmp_path / "ranker.npz")
    ranker.save(p)
    r2 = Ranker.load(p, cfg)
    x = feats[:64]
    np.testing.assert_allclose(ranker.predict(x), r2.predict(x), rtol=1e-5)
    assert r2.feature_names == names
