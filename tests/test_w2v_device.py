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
