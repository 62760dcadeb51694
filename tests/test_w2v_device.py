"""Device-sampled SGNS training path (no host pair materialization)."""
import numpy as np
import pytest

from otto_tpu.config import Word2VecConfig
from otto_tpu.models.word2vec import train_word2vec_device
from tests.test_word2vec import simple_events


def test_device_sampler_embeds_topics():
    ev = simple_events(n_topics=40, items_per_topic=5, n_sessions=2000,
                       sess_len=8)
    n_aids = 200
    cfg = Word2VecConfig(
        name="t", vector_size=16, window=4, min_count=1, negatives=5,
        batch_size=8192, epochs=8, learning_rate=0.1, subsample_t=0,
    )
    model = train_word2vec_device(ev, cfg, n_aids=n_aids, max_len=16)
    emb = model.embedding_by_aid(n_aids)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    sim = emb @ emb.T
    topic = np.arange(n_aids) // 5
    same = topic[:, None] == topic[None, :]
    off = ~np.eye(n_aids, dtype=bool)
    intra = sim[same & off].mean()
    inter = sim[~same].mean()
    assert intra > inter + 0.3, (intra, inter)


def test_device_sampler_type_filter():
    ev = simple_events(n_sessions=100, sess_len=6)
    # all events are clicks; filtering to carts/orders leaves nothing
    cfg = Word2VecConfig(name="t", types=(1, 2), vector_size=8, min_count=1)
    with pytest.raises(ValueError):
        train_word2vec_device(ev, cfg, n_aids=20)


def test_block_sampler_embeds_topics():
    """Round-4 block-sampled chunk step (center blocks + alias negatives +
    position map) learns topic structure like the legacy path."""
    ev = simple_events(n_topics=40, items_per_topic=5, n_sessions=2000,
                       sess_len=8)
    n_aids = 200
    cfg = Word2VecConfig(
        name="t", vector_size=16, window=4, min_count=1, negatives=5,
        batch_size=8192, epochs=8, learning_rate=0.1, subsample_t=0,
        neg_sharing="chunk", block_k=4,
    )
    model = train_word2vec_device(ev, cfg, n_aids=n_aids, max_len=16)
    emb = model.embedding_by_aid(n_aids)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    sim = emb @ emb.T
    topic = np.arange(n_aids) // 5
    same = topic[:, None] == topic[None, :]
    off = ~np.eye(n_aids, dtype=bool)
    intra = sim[same & off].mean()
    inter = sim[~same].mean()
    assert intra > inter + 0.3, (intra, inter)


def test_pack_position_info_oracle():
    from otto_tpu.models.word2vec import pack_position_info

    cum = np.array([0, 3, 5, 9], np.int32)
    packed = pack_position_info(cum)
    pos = packed >> 16
    slen = packed & 0xFFFF
    assert pos.tolist() == [0, 1, 2, 0, 1, 0, 1, 2, 3]
    assert slen.tolist() == [3, 3, 3, 2, 2, 4, 4, 4, 4]


def test_alias_sampler_matches_unigram_distribution():
    import jax
    import jax.numpy as jnp

    from otto_tpu.models.word2vec import _alias_draw, make_alias

    counts = np.array([100, 50, 10, 5, 1, 1, 1, 1], np.int64)
    prob, alias = make_alias(counts, ns_exponent=0.75)
    want = counts.astype(np.float64) ** 0.75
    want /= want.sum()
    draws = np.asarray(
        _alias_draw(jnp.asarray(prob), jnp.asarray(alias), 200_000,
                    jax.random.PRNGKey(0))
    )
    got = np.bincount(draws, minlength=len(counts)) / len(draws)
    np.testing.assert_allclose(got, want, atol=0.01)

