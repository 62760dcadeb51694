"""Label-free quality diagnostics.

w2vec x co-count neighbour overlap: the reference's only embedding-quality
instrument that needs no labels (reference: model/w2vec_aids.py:246-336 —
for sampled aids, the fraction of an aid's co-count neighbour set that its
w2vec kNN set recovers, 'co-countXw2vec', averaged over 200 random aids and
persisted as stats_w2vec_x_co_click-{model}.csv). Healthy embeddings on
OTTO-like data recover a large fraction of strong co-visitation neighbours;
a near-zero overlap means the SGNS run failed regardless of recall metrics.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def w2vec_covis_overlap(
    knn_neighbor: np.ndarray,    # [A, k] w2vec kNN table (-1 pad)
    covis_neighbor: np.ndarray,  # [A, N] co-count top-N table (-1 pad)
    n_sample: int = 200,
    cap: int = 20,
    seed: int = 42,
) -> Dict[str, float]:
    """Mean overlap stats over sampled aids having BOTH neighbour sets.

    Per aid (reference r['co-countXw2vec'] formula): the overlap is
    |co ∩ w2v| / min(cap, |co|) — the share of (capped) co-count
    neighbours the embedding kNN recovers. Also reports the reverse
    direction (share of w2v neighbours backed by co-counts) and coverage.
    """
    knn_neighbor = np.asarray(knn_neighbor)
    covis_neighbor = np.asarray(covis_neighbor)
    A = min(len(knn_neighbor), len(covis_neighbor))
    has_w2v = (knn_neighbor[:A] >= 0).any(axis=1)
    has_co = (covis_neighbor[:A] >= 0).any(axis=1)
    both = np.flatnonzero(has_w2v & has_co)
    if len(both) == 0:
        return {"co_count_x_w2vec": 0.0, "w2vec_x_co_count": 0.0,
                "n_aids_compared": 0, "coverage_both": 0.0}
    rng = np.random.default_rng(seed)
    pick = (
        both
        if len(both) <= n_sample
        else rng.choice(both, n_sample, replace=False)
    )
    co = covis_neighbor[pick][:, :cap]          # [n, N']
    wv = knn_neighbor[pick][:, :cap]            # [n, k']
    co_valid = co >= 0
    wv_valid = wv >= 0
    # [n, N', k'] membership grid (N', k' <= 20: tiny)
    hit = (co[:, :, None] == wv[:, None, :]) & co_valid[:, :, None] & wv_valid[:, None, :]
    inter = hit.any(axis=2).sum(axis=1)                     # co nbrs recovered
    inter_rev = hit.any(axis=1).sum(axis=1)                 # w2v nbrs backed
    n_co = np.minimum(co_valid.sum(axis=1), cap)
    n_wv = np.minimum(wv_valid.sum(axis=1), cap)
    return {
        "co_count_x_w2vec": float(np.mean(inter / np.maximum(n_co, 1))),
        "w2vec_x_co_count": float(np.mean(inter_rev / np.maximum(n_wv, 1))),
        "n_aids_compared": int(len(pick)),
        "coverage_both": float(len(both) / max(A, 1)),
    }


def write_overlap_report(path: str, stats: Dict[str, float]) -> None:
    """CSV mirror of the reference's stats_w2vec_x_co_click report
    (reference: model/w2vec_aids.py:333-334)."""
    with open(path, "w") as fh:
        fh.write(",".join(stats.keys()) + "\n")
        fh.write(",".join(f"{v:.6g}" if isinstance(v, float) else str(v)
                          for v in stats.values()) + "\n")
