"""Per-source retrieval evaluation (C14).

The reference evaluates the recall ceiling of every candidate source
separately — src_any, src_self, the five co-count sources, two w2vec
sources, cluster popularity — plus "source & not self" variants and
candidate-count statistics (reference: model/eval_retrieved.py:37-139).
This reproduces that report over RetrievedBatch outputs.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from otto_tpu.data.schema import Labels
from otto_tpu.engine.retrieval import (
    FEATURE_INDEX,
    SOURCE_FLAGS,
    RetrievedBatch,
)
from otto_tpu.eval.recall import recall_at_k

# bit order matches RetrievedBatch.pack_meta's packed flag pull
SOURCES = SOURCE_FLAGS


class SrcFlagBatch:
    """Lightweight stand-in for RetrievedBatch carrying only what the
    per-source report needs: the source-flag bits, PACKED on device into
    one uint16 lane per candidate (bit k = SOURCES[k]). Packing cuts the
    per-batch pull 10x vs a [S, C, 10] bool pull (flag extraction was 10%
    of streaming pass-A wall) and the host copy 10x at full scale."""

    __slots__ = ("session", "cand", "flags")

    def __init__(self, session, cand, flags):
        # flags: [S, C] uint16 bitmask (packed) or [S, C, n_src] bool
        self.session, self.cand, self.flags = session, cand, flags

    def src(self, name: str) -> np.ndarray:
        k = SOURCES.index(name)
        if self.flags.ndim == 2:
            return (self.flags >> k) & 1 > 0
        return self.flags[:, :, k]

    @classmethod
    def from_batch(cls, b: RetrievedBatch) -> "SrcFlagBatch":
        packed = np.asarray(_pack_flags_program(b.feats))
        return cls(b.session, b.cand, packed)


def _pack_flags_impl(feats):
    import jax.numpy as jnp

    idx = jnp.asarray([FEATURE_INDEX[s] for s in SOURCES])
    bits = (feats[:, :, idx] > 0).astype(jnp.int32)      # [S, C, n_src]
    w = (1 << jnp.arange(len(SOURCES), dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * w, axis=-1).astype(jnp.uint16)


_pack_flags_jit = None


def _pack_flags_program(feats):
    import jax

    global _pack_flags_jit
    if _pack_flags_jit is None:
        _pack_flags_jit = jax.jit(_pack_flags_impl)
    return _pack_flags_jit(feats)


def _masked_cands(batches, mask_fn):
    sess, cands = [], []
    for b in batches:
        m = mask_fn(b)
        sess.append(b.session)
        cands.append(np.where(m, b.cand, -1))
    return np.concatenate(sess), np.concatenate(cands)


def _src(b, name: str) -> np.ndarray:
    if isinstance(b, SrcFlagBatch):
        return b.src(name)
    return b.feats[:, :, FEATURE_INDEX[name]] > 0


def eval_retrieved_by_source(
    batches: List[RetrievedBatch],
    labels: Labels,
    cutoffs: Sequence[int] = (20, 100, 200),
    include_not_self: bool = True,
) -> Dict[str, Dict]:
    """-> {source: {type: {topK: recall}}} plus candidate-count stats under
    '_counts' (reference: model/eval_retrieved.py:128-138)."""
    report: Dict[str, Dict] = {}
    filters = {s: (lambda b, s=s: _src(b, s)) for s in SOURCES}
    if include_not_self:
        for s in SOURCES:
            if s in ("src_any", "src_self"):
                continue
            filters[f"{s} & not self"] = (
                lambda b, s=s: _src(b, s) & ~_src(b, "src_self")
            )

    for name, mask_fn in filters.items():
        sess, cands = _masked_cands(batches, mask_fn)
        report[name] = recall_at_k(sess, cands, labels, cutoffs)

    # candidates-per-session stats by source
    counts: Dict[str, Dict[str, float]] = {}
    for s in SOURCES:
        per_session = np.concatenate(
            [(_src(b, s) & (b.cand >= 0)).sum(axis=1) for b in batches]
        )
        counts[s] = {
            "mean": float(per_session.mean()),
            "min": int(per_session.min()),
            "p50": float(np.percentile(per_session, 50)),
            "p95": float(np.percentile(per_session, 95)),
            "max": int(per_session.max()),
        }
    report["_counts"] = counts
    return report


def format_report(report: Dict[str, Dict], k: int = 20) -> str:
    lines = [f"{'source':<34} {'type':<8} top20    top100   top200   topall"]
    for src, by_type in report.items():
        if src == "_counts":
            continue
        for tname in ("clicks", "carts", "orders", "total"):
            r = by_type[tname]
            lines.append(
                f"{src:<34} {tname:<8} "
                f"{r['top20']:.4f}   {r['top100']:.4f}   "
                f"{r['top200']:.4f}   {r['topall']:.4f}"
            )
    return "\n".join(lines)
