"""SGNS word2vec: vocabulary semantics, pair generation, and that training
actually embeds co-occurring items nearby."""
import numpy as np
import jax.numpy as jnp
import pytest

from otto_tpu.config import Word2VecConfig
from otto_tpu.data.schema import Events
from otto_tpu.data.synthetic import SyntheticSpec, generate
from otto_tpu.models.word2vec import (
    Vocab,
    build_vocab,
    make_neg_cdf,
    skipgram_pairs,
    train_word2vec,
)


def simple_events(n_topics=2, items_per_topic=3, n_sessions=200, sess_len=6):
    """Sessions draw items from a single topic; topics never co-occur."""
    sessions, aids = [], []
    rng = np.random.default_rng(0)
    for s in range(n_sessions):
        topic = s % n_topics
        base = topic * 10 if n_topics <= 2 else topic * items_per_topic
        seq = base + rng.integers(0, items_per_topic, size=sess_len)
        sessions.extend([s] * sess_len)
        aids.extend(seq.tolist())
    n = len(sessions)
    return Events(
        session=np.array(sessions, np.int32),
        aid=np.array(aids, np.int32),
        ts=np.arange(n, dtype=np.int32),
        type=np.zeros(n, np.int8),
    )


def test_build_vocab_frequency_order():
    ev = Events(
        session=np.zeros(6, np.int32),
        aid=np.array([5, 5, 5, 3, 3, 9], np.int32),
        ts=np.arange(6, dtype=np.int32),
        type=np.zeros(6, np.int8),
    )
    v = build_vocab(ev, (0, 1, 2), min_count=2)
    assert v.aid_of_word.tolist() == [5, 3]  # 9 below min_count
    assert v.word_of_aid[5] == 0 and v.word_of_aid[3] == 1
    assert v.word_of_aid[9] == -1
    assert v.counts.tolist() == [3, 2]


def test_skipgram_pairs_within_window_and_session():
    ev = Events(
        session=np.array([0, 0, 0, 1, 1], np.int32),
        aid=np.array([1, 2, 3, 4, 5], np.int32),
        ts=np.arange(5, dtype=np.int32),
        type=np.zeros(5, np.int8),
    )
    v = build_vocab(ev, (0,), min_count=1)
    rng = np.random.default_rng(0)
    c, x = skipgram_pairs(ev, v, (0,), window=4, subsample_t=0, rng=rng)
    # decode back to aids
    pairs = set(zip(v.aid_of_word[c].tolist(), v.aid_of_word[x].tolist()))
    # no cross-session pairs
    for a, b in pairs:
        assert (a in (1, 2, 3)) == (b in (1, 2, 3))
    # session 1 with window>=1 must contain (4,5)
    assert (4, 5) in pairs or (5, 4) in pairs


def test_neg_cdf():
    cdf = make_neg_cdf(np.array([100, 10, 1]))
    assert cdf[-1] == 1.0
    assert np.all(np.diff(cdf) > 0)


def test_training_embeds_topics():
    # 40 topics x 5 items: negatives rarely collide with true contexts
    ev = simple_events(n_topics=40, items_per_topic=5, n_sessions=2000, sess_len=8)
    n_aids = 200
    cfg = Word2VecConfig(
        name="t", vector_size=16, window=4, min_count=1, negatives=5,
        batch_size=4096, epochs=10, learning_rate=0.1, subsample_t=0,
    )
    model = train_word2vec(ev, cfg, n_aids=n_aids)
    emb = model.embedding_by_aid(n_aids)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    sim = emb @ emb.T
    topic = np.arange(n_aids) // 5
    same = topic[:, None] == topic[None, :]
    off_diag = ~np.eye(n_aids, dtype=bool)
    intra = sim[same & off_diag].mean()
    inter = sim[~same].mean()
    assert intra > inter + 0.3, (intra, inter)


def test_embedding_by_aid_zeros_for_oov():
    ev = simple_events()
    cfg = Word2VecConfig(name="t", vector_size=8, min_count=1, epochs=1,
                         batch_size=256, subsample_t=0)
    model = train_word2vec(ev, cfg, n_aids=20)
    table = model.embedding_by_aid(20)
    assert np.all(table[15] == 0)  # aid 15 never seen


def test_save_load_roundtrip(tmp_path):
    ev = simple_events()
    cfg = Word2VecConfig(name="t", vector_size=8, min_count=1, epochs=1,
                         batch_size=256, subsample_t=0)
    model = train_word2vec(ev, cfg, n_aids=13)
    p = str(tmp_path / "w2v.npz")
    model.save(p)
    from otto_tpu.models.word2vec import Word2Vec

    m2 = Word2Vec.load(p, cfg)
    assert np.array_equal(m2.emb, model.emb)
    assert np.array_equal(m2.vocab.aid_of_word, model.vocab.aid_of_word)
