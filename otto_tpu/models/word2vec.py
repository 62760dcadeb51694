"""Skip-gram negative-sampling item embeddings in JAX (C8).

Replaces gensim's 16-thread hogwild C trainer (reference:
model/w2vec_aids.py:56-70, Word2Vec(vector_size=100, window=10, min_count=5))
with a batched SGNS program: the embedding tables live on device (row-sharded
over the 'model' mesh axis at scale), the host streams (center, context)
pairs, and negatives are drawn on device from the unigram^0.75 table.
Hogwild's racy updates become exact batched scatter-adds — deterministic and
MXU/VPU-friendly.

Differences vs the reference, by design:
  * skip-gram instead of gensim's default CBOW (better for sparse item co-
    occurrence; the intentional model-class change is allowed per BASELINE).
  * dynamic window + frequent-word subsampling match gensim semantics.

Vocabulary order matches gensim's `wv.index_to_key` (frequency-descending,
reference: model/w2vec_aids.py:199) so the "first_n_aids most frequent"
kNN-query semantics (reference: config.py:109,125) carry over.
"""
from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.config import Word2VecConfig
from otto_tpu.data.schema import Events

log = logging.getLogger(__name__)


class Vocab(NamedTuple):
    """aid <-> dense word-index maps, frequency-descending like gensim."""

    aid_of_word: np.ndarray   # [V] int32: word idx -> aid
    word_of_aid: np.ndarray   # [n_aids] int32: aid -> word idx, -1 if OOV
    counts: np.ndarray        # [V] int64 word frequencies

    @property
    def size(self) -> int:
        return len(self.aid_of_word)


def build_vocab(ev: Events, types: Tuple[int, ...], min_count: int, n_aids: Optional[int] = None) -> Vocab:
    m = np.isin(ev.type, np.asarray(types, np.int8))
    aids = ev.aid[m]
    n_aids = n_aids or (int(ev.aid.max()) + 1)
    counts = np.bincount(aids, minlength=n_aids)
    keep = counts >= min_count
    kept_aids = np.nonzero(keep)[0]
    order = np.argsort(-counts[kept_aids], kind="stable")
    aid_of_word = kept_aids[order].astype(np.int32)
    word_of_aid = np.full(n_aids, -1, np.int32)
    word_of_aid[aid_of_word] = np.arange(len(aid_of_word), dtype=np.int32)
    return Vocab(aid_of_word, word_of_aid, counts[aid_of_word].astype(np.int64))


class SGNSParams(NamedTuple):
    emb_in: jnp.ndarray   # [V, D] float32
    emb_out: jnp.ndarray  # [V, D] float32
    acc_in: jnp.ndarray   # [V] float32 Adagrad accumulators (per row)
    acc_out: jnp.ndarray  # [V] float32


def init_params(vocab_size: int, dim: int, seed: int) -> SGNSParams:
    k = jax.random.PRNGKey(seed)
    emb_in = (jax.random.uniform(k, (vocab_size, dim)) - 0.5) / dim
    emb_out = jnp.zeros((vocab_size, dim), jnp.float32)
    acc_in = jnp.full((vocab_size,), 1e-6, jnp.float32)
    acc_out = jnp.full((vocab_size,), 1e-6, jnp.float32)
    return SGNSParams(emb_in, emb_out, acc_in, acc_out)


def _sgns_loss(params: SGNSParams, center, pos, negs):
    """-log s(in_c . out_p) - sum log s(-in_c . out_n).

    SUM-reduced: a row's gradient accumulates one term per occurrence in the
    batch, so lr keeps gensim's per-pair semantics (sequential hogwild SGD,
    reference: model/w2vec_aids.py:63) rather than shrinking with batch size.
    """
    c = params.emb_in[center]                      # [B, D]
    p = params.emb_out[pos]                        # [B, D]
    n = params.emb_out[negs]                       # [B, K, D]
    pos_logit = jnp.sum(c * p, axis=-1)
    neg_logit = jnp.einsum("bd,bkd->bk", c, n)
    loss = -jax.nn.log_sigmoid(pos_logit) - jnp.sum(
        jax.nn.log_sigmoid(-neg_logit), axis=-1
    )
    return jnp.sum(loss)


@partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
def sgns_step(
    params: SGNSParams,
    center: jnp.ndarray,     # [B] int32
    pos: jnp.ndarray,        # [B] int32
    neg_cdf: jnp.ndarray,    # [V] float32 unigram^0.75 CDF
    lr: jnp.ndarray,         # [] float32
    key: jnp.ndarray,
    n_negs: int = 8,
) -> Tuple[SGNSParams, jnp.ndarray]:
    B = center.shape[0]
    u = jax.random.uniform(key, (B, n_negs))
    negs = jnp.searchsorted(neg_cdf, u).astype(jnp.int32)
    loss, grads = jax.value_and_grad(_sgns_loss)(params, center, pos, negs)
    # per-row Adagrad: frequent rows (many accumulated pair grads per batch)
    # get proportionally damped steps — the batched analogue of hogwild's
    # many small sequential updates.
    g_in_sq = jnp.mean(grads.emb_in**2, axis=1)
    g_out_sq = jnp.mean(grads.emb_out**2, axis=1)
    acc_in = params.acc_in + g_in_sq
    acc_out = params.acc_out + g_out_sq
    scale_in = lr * jax.lax.rsqrt(acc_in + 1e-8)
    scale_out = lr * jax.lax.rsqrt(acc_out + 1e-8)
    new = SGNSParams(
        emb_in=params.emb_in - scale_in[:, None] * grads.emb_in,
        emb_out=params.emb_out - scale_out[:, None] * grads.emb_out,
        acc_in=acc_in,
        acc_out=acc_out,
    )
    return new, loss / B


# keep a non-donating alias for shape-probing / multi-chip dryrun
sgns_step_ref = sgns_step


def make_neg_cdf(counts: np.ndarray, ns_exponent: float = 0.75) -> np.ndarray:
    p = counts.astype(np.float64) ** ns_exponent
    cdf = np.cumsum(p / p.sum())
    cdf[-1] = 1.0
    return cdf.astype(np.float32)


def skipgram_pairs(
    ev: Events,
    vocab: Vocab,
    types: Tuple[int, ...],
    window: int,
    subsample_t: float,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side pair generation with gensim semantics: per-position dynamic
    window b ~ U{1..window}; frequent-word subsampling with threshold t."""
    m = np.isin(ev.type, np.asarray(types, np.int8))
    sess = ev.session[m]
    words = vocab.word_of_aid[ev.aid[m]]
    keep = words >= 0
    sess, words = sess[keep], words[keep]

    if subsample_t > 0:
        freq = vocab.counts / vocab.counts.sum()
        keep_prob = np.minimum(
            1.0, np.sqrt(subsample_t / np.maximum(freq, 1e-12))
            + subsample_t / np.maximum(freq, 1e-12)
        )
        keep = rng.random(len(words)) < keep_prob[words]
        sess, words = sess[keep], words[keep]

    if len(words) == 0:
        return np.array([], np.int32), np.array([], np.int32)

    # session boundaries (input is session-sorted)
    boundary = np.empty(len(sess), bool)
    boundary[0] = True
    boundary[1:] = sess[1:] != sess[:-1]
    sess_start_idx = np.maximum.accumulate(np.where(boundary, np.arange(len(sess)), 0))
    # next boundary (exclusive end of session) per position
    end_idx = np.empty(len(sess), np.int64)
    ends = np.append(np.nonzero(boundary)[0][1:], len(sess))
    end_idx = ends[np.cumsum(boundary) - 1]

    centers, contexts = [], []
    b = rng.integers(1, window + 1, size=len(words))
    pos = np.arange(len(words))
    for off in range(1, window + 1):
        ok = b >= off
        # context at +off
        j = pos + off
        sel = ok & (j < end_idx)
        centers.append(words[pos[sel]])
        contexts.append(words[j[sel]])
        # context at -off
        j2 = pos - off
        sel2 = ok & (j2 >= sess_start_idx)
        centers.append(words[pos[sel2]])
        contexts.append(words[j2[sel2]])
    c = np.concatenate(centers).astype(np.int32)
    x = np.concatenate(contexts).astype(np.int32)
    perm = rng.permutation(len(c))
    return c[perm], x[perm]


@dataclasses.dataclass
class Word2Vec:
    """Trained model: vocabulary + embeddings (gensim .model analogue,
    reference: model/w2vec_aids.py:64)."""

    cfg: Word2VecConfig
    vocab: Vocab
    emb: np.ndarray  # [V, dim] float32 input embeddings (wv.vectors analogue)

    def embedding_by_aid(self, n_aids: int) -> np.ndarray:
        """[n_aids, dim] table, zeros for OOV aids (reference fills missing
        embeddings with 0, model/kmeans_sessions.py:63)."""
        out = np.zeros((n_aids, self.emb.shape[1]), np.float32)
        out[self.vocab.aid_of_word] = self.emb
        return out

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            aid_of_word=self.vocab.aid_of_word,
            word_of_aid=self.vocab.word_of_aid,
            counts=self.vocab.counts,
            emb=self.emb,
        )

    @staticmethod
    def load(path: str, cfg: Word2VecConfig) -> "Word2Vec":
        z = np.load(path)
        return Word2Vec(
            cfg,
            Vocab(z["aid_of_word"], z["word_of_aid"], z["counts"]),
            z["emb"],
        )


def train_word2vec(
    ev: Events,
    cfg: Word2VecConfig,
    n_aids: Optional[int] = None,
    callback=None,
) -> Word2Vec:
    """Full training loop (reference: model/w2vec_aids.py:56-70)."""
    rng = np.random.default_rng(cfg.seed)
    vocab = build_vocab(ev, cfg.types, cfg.min_count, n_aids)
    if vocab.size == 0:
        raise ValueError("empty vocabulary")
    V = vocab.size
    D = cfg.vector_size
    params = init_params(V, D, cfg.seed)
    neg_cdf = jnp.asarray(make_neg_cdf(vocab.counts, cfg.ns_exponent))
    key = jax.random.PRNGKey(cfg.seed)

    total_steps = 0
    # count steps for lr schedule: pairs per epoch is data dependent; estimate
    # from epoch 0 lazily by generating pairs per epoch.
    for epoch in range(cfg.epochs):
        c, x = skipgram_pairs(
            ev, vocab, cfg.types, cfg.window, cfg.subsample_t, rng
        )
        n_steps = max(1, len(c) // cfg.batch_size)
        for i in range(n_steps):
            sl = slice(i * cfg.batch_size, (i + 1) * cfg.batch_size)
            cb, xb = c[sl], x[sl]
            if len(cb) < cfg.batch_size:  # pad to static shape
                pad = cfg.batch_size - len(cb)
                cb = np.concatenate([cb, np.zeros(pad, np.int32)])
                xb = np.concatenate([xb, np.zeros(pad, np.int32)])
            frac = (epoch + i / n_steps) / cfg.epochs
            lr = jnp.float32(
                cfg.learning_rate
                + (cfg.min_learning_rate - cfg.learning_rate) * frac
            )
            key, sub = jax.random.split(key)
            params, loss = sgns_step(
                params, jnp.asarray(cb), jnp.asarray(xb), neg_cdf, lr, sub,
                cfg.negatives,
            )
            total_steps += 1
        if callback is not None:
            callback(epoch, float(loss))
        log.info("w2v %s epoch %d: %d pairs, loss=%.4f", cfg.name, epoch, len(c), float(loss))

    emb = np.asarray(params.emb_in)[:, : cfg.vector_size]
    return Word2Vec(cfg, vocab, emb)
