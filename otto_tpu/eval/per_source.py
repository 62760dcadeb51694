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


class DeviceSourceEval:
    """Streaming device-side C14 evaluator: per retrieval batch, ONE jitted
    program folds the packed meta (cand + source flags) and the device
    label bits into running [n_filters, 3 types, n_cutoffs] hit counters
    and [n_sources, C+1] candidate-count histograms — the host pulls a few
    KB once at the end.

    Replaces the post-pass host phase that materialized 18 masked copies
    of the full [3.17M, 512] candidate matrix through numpy (measured ~33
    min at reference scale on the 2-core host, hidden between the
    eval_retrieved and ranker stage rows) plus the multi-GB flag/candidate
    accumulation feeding it. Semantics bit-match eval_retrieved_by_source
    + recall_at_k (oracle-tested): hit = label candidate flagged by the
    source within the first `cutoff` candidate COLUMNS, per-session hits
    and truths both capped at 20 (reference: model/eval_retrieved.py:57-93,
    eval_submission.py:48)."""

    CUTOFFS = (20, 100, 200)  # + implicit "all" = C

    def __init__(self, n_cols: int, truth_cap: int = 20):
        import jax.numpy as jnp

        self.n_cols = n_cols
        self.truth_cap = truth_cap
        # filters: 10 sources + "& not self" for all but any/self
        self.filter_names = list(SOURCES) + [
            f"{s} & not self" for s in SOURCES
            if s not in ("src_any", "src_self")
        ]
        nf = len(self.filter_names)
        nl = len(self.CUTOFFS) + 1
        self.hits = jnp.zeros((nf, 3, nl), jnp.int32)
        self.hist = jnp.zeros((len(SOURCES), n_cols + 1), jnp.int32)
        self._program = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        n_src = len(SOURCES)
        self_bit = SOURCES.index("src_self")
        # (source bit, require-not-self) per filter, static
        fspec = []
        for name in self.filter_names:
            base = name.split(" & ")[0]
            fspec.append((SOURCES.index(base), name.endswith("not self")))
        lims = tuple(list(self.CUTOFFS) + [self.n_cols])
        cap = self.truth_cap

        @jax.jit
        def program(meta, tbits, hits, hist):
            valid = (meta >> n_src) > 0            # cand + 1 > 0
            col = jnp.arange(meta.shape[1], dtype=jnp.int32)[None, :]
            self_f = ((meta >> self_bit) & 1) > 0
            lab = [((tbits >> t) & 1) > 0 for t in range(3)]
            new_hits = []
            for bit, not_self in fspec:
                m = (((meta >> bit) & 1) > 0) & valid
                if not_self:
                    m = m & ~self_f
                row = []
                for t in range(3):
                    ml = m & lab[t]
                    per_lim = []
                    for lim in lims:
                        cnt = jnp.sum(
                            (ml & (col < lim)).astype(jnp.int32), axis=1
                        )
                        per_lim.append(
                            jnp.sum(jnp.minimum(cnt, cap))
                        )
                    row.append(jnp.stack(per_lim))
                new_hits.append(jnp.stack(row))
            hits = hits + jnp.stack(new_hits)
            # per-source candidate-count histograms (exact percentiles)
            oh = []
            for bit, _ in fspec[:n_src]:
                m = (((meta >> bit) & 1) > 0) & valid
                cnt = jnp.sum(m.astype(jnp.int32), axis=1)
                oh.append(
                    jnp.sum(
                        jax.nn.one_hot(
                            cnt, self.n_cols + 1, dtype=jnp.int32
                        ),
                        axis=0,
                    )
                )
            hist = hist + jnp.stack(oh)
            return hits, hist

        return program

    def update(self, meta, tbits) -> None:
        """Dispatch one batch's accumulation (no host sync)."""
        if self._program is None:
            self._program = self._build()
        self.hits, self.hist = self._program(
            meta, tbits, self.hits, self.hist
        )

    def finalize(self, labels: Labels) -> Dict[str, Dict]:
        """-> report dict shaped exactly like eval_retrieved_by_source
        (incl. '_counts'), plus the ceiling dict under '_ceiling' shaped
        like recall_at_k's output (the src_any filter IS the full
        candidate set)."""
        from otto_tpu.config import TYPE2ID, TYPE_WEIGHTS, TYPES

        hits = np.asarray(self.hits)
        hist = np.asarray(self.hist)
        # denominators: sum of capped truth counts per type, over ALL
        # labeled sessions (independent of retrieval)
        denom = np.zeros(3, np.int64)
        for tid in range(3):
            lab = labels.for_type(tid)
            if len(lab):
                _, cnt = np.unique(lab.session, return_counts=True)
                denom[tid] = np.minimum(cnt, self.truth_cap).sum()
        keys = [f"top{c}" for c in self.CUTOFFS] + ["topall"]

        report: Dict[str, Dict] = {}
        for fi, name in enumerate(self.filter_names):
            by_type: Dict[str, Dict[str, float]] = {}
            for tname, tid in TYPE2ID.items():
                by_type[tname] = {
                    k: (float(hits[fi, tid, li]) / denom[tid]
                        if denom[tid] else 0.0)
                    for li, k in enumerate(keys)
                }
            by_type["total"] = {
                k: sum(TYPE_WEIGHTS[t] * by_type[t][k] for t in TYPES)
                for k in keys
            }
            report[name] = by_type

        counts: Dict[str, Dict[str, float]] = {}
        for si, s in enumerate(SOURCES):
            h = hist[si]
            n = int(h.sum())
            vals = np.arange(len(h))
            nz = np.nonzero(h)[0]
            cum = np.cumsum(h)

            def pctl(q):
                # np.percentile 'linear' semantics, exact from the histogram
                t = q / 100.0 * (n - 1)
                f, c = int(np.floor(t)), int(np.ceil(t))
                lo = float(vals[np.searchsorted(cum, f + 1)])
                hi = float(vals[np.searchsorted(cum, c + 1)])
                return lo + (hi - lo) * (t - f)

            counts[s] = {
                "mean": float((h * vals).sum() / max(n, 1)),
                "min": int(nz[0]) if len(nz) else 0,
                "p50": pctl(50),
                "p95": pctl(95),
                "max": int(nz[-1]) if len(nz) else 0,
            }
        report["_counts"] = counts
        report["_ceiling"] = report["src_any"]
        return report


def format_report(report: Dict[str, Dict], k: int = 20) -> str:
    lines = [f"{'source':<34} {'type':<8} top20    top100   top200   topall"]
    for src, by_type in report.items():
        if src.startswith("_"):
            continue
        for tname in ("clicks", "carts", "orders", "total"):
            r = by_type[tname]
            lines.append(
                f"{src:<34} {tname:<8} "
                f"{r['top20']:.4f}   {r['top100']:.4f}   "
                f"{r['top200']:.4f}   {r['topall']:.4f}"
            )
    return "\n".join(lines)
