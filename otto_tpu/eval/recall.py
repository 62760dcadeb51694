"""Recall@k evaluators (C14, C19).

Semantics exactly match the reference scorer (reference:
model/eval_submission.py:44-63):
  * per (session, type): true = min(k, n_labels); hit = |topk ∩ labels|
  * recall_type = sum(hit) / sum(true) over sessions WITH labels
  * total = 0.1*clicks + 0.3*carts + 0.6*orders

And the retrieval evaluator's multi-cutoff variant (reference:
model/eval_retrieved.py:57-114): recall of the retrieved candidate set at
top20/100/200/all assuming ideal ranking.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import numpy as np

from otto_tpu.config import TYPE2ID, TYPE_WEIGHTS, TYPES
from otto_tpu.data.schema import Labels


def _hits_per_session(
    pred_sessions: np.ndarray,  # [P] session id per prediction row
    pred_aids: np.ndarray,      # [P, K] predicted aids (-1 pad), rank order
    labels: Labels,
    cutoffs: Sequence[int],
    truth_cap: int = 20,
) -> Dict[int, Dict[str, float]]:
    """For each type: {cutoff: recall}."""
    out: Dict[int, Dict[str, float]] = {}
    K = pred_aids.shape[1]
    order = np.argsort(pred_sessions, kind="stable")
    ps = pred_sessions[order]
    pa = pred_aids[order]

    for type_id in (0, 1, 2):
        lab = labels.for_type(type_id)
        if len(lab) == 0:
            out[type_id] = {str(c): 0.0 for c in cutoffs} | {"all": 0.0}
            continue
        lorder = np.lexsort((lab.aid, lab.session))
        ls, la = lab.session[lorder], lab.aid[lorder]
        # truth per session, capped (reference: model/eval_submission.py:48)
        u_sess, l_sess_idx = np.unique(ls, return_inverse=True)
        true = np.minimum(np.bincount(l_sess_idx), truth_cap)

        # locate prediction rows for labeled sessions (vectorized)
        p_idx = np.searchsorted(ps, u_sess)
        has_pred = (p_idx < len(ps)) & (ps[np.minimum(p_idx, len(ps) - 1)] == u_sess)
        row_of_label = p_idx[l_sess_idx]
        label_has_pred = has_pred[l_sess_idx]

        # each label's rank in its session's prediction list (or K = miss)
        rows = pa[np.minimum(row_of_label, len(pa) - 1)]         # [L, K]
        eq = (rows == la[:, None]) & (rows >= 0)
        found_rank = np.where(eq.any(axis=1), eq.argmax(axis=1), K)
        found_rank = np.where(label_has_pred, found_rank, K)

        res = {}
        for c in list(cutoffs) + ["all"]:
            lim = K if c == "all" else min(int(c), K)
            hit = found_rank < lim
            per_sess = np.minimum(
                np.bincount(l_sess_idx[hit], minlength=len(u_sess)), truth_cap
            )
            key = "all" if c == "all" else str(c)
            res[key] = float(per_sess.sum()) / float(true.sum())
        out[type_id] = res
    return out


def evaluate_topk(
    pred_by_type: Mapping[str, tuple],
    labels: Labels,
    k: int = 20,
) -> Dict[str, float]:
    """Submission-style eval (C19). pred_by_type maps 'clicks'/'carts'/
    'orders' -> (sessions [N], aids [N, K]); aids in rank order, -1 pad.
    Returns {'clicks': r, 'carts': r, 'orders': r, 'total': weighted}."""
    out: Dict[str, float] = {}
    total = 0.0
    for tname in TYPES:
        sessions, aids = pred_by_type[tname]
        aids = aids[:, :k]
        res = _hits_per_session(sessions, aids, labels, cutoffs=(k,))
        r = res[TYPE2ID[tname]][str(k)]
        out[tname] = r
        total += TYPE_WEIGHTS[tname] * r
    out["total"] = total
    return out


def evaluate_submission_file(path: str, labels: Labels, k: int = 20) -> Dict[str, float]:
    """Independent re-parse + eval of a written submission CSV — the
    cross-check role of the organizer's external scorer
    (reference: model/eval_submission.py:12-70, eval_submission_otto.sh)."""
    from otto_tpu.engine.rank import read_submission

    sub = read_submission(path)
    preds = {}
    for tname in TYPES:
        rows = sub.get(tname, {})
        sessions = np.fromiter(rows.keys(), np.int32, len(rows))
        aids = np.full((len(rows), k), -1, np.int32)
        for i, alist in enumerate(rows.values()):
            a = np.asarray(alist[:k], np.int32)
            aids[i, : len(a)] = a
        preds[tname] = (sessions, aids)
    return evaluate_topk(preds, labels, k)


def recall_at_k(
    sessions: np.ndarray,
    aids: np.ndarray,
    labels: Labels,
    cutoffs: Sequence[int] = (20, 100, 200),
) -> Dict[str, Dict[str, float]]:
    """Retrieval-ceiling eval (C14): recall of the (ideally ranked) candidate
    set at several cutoffs, per type + weighted total
    (reference: model/eval_retrieved.py:57-114)."""
    res = _hits_per_session(sessions, aids, labels, cutoffs=cutoffs)
    out: Dict[str, Dict[str, float]] = {}
    keys = [str(c) for c in cutoffs] + ["all"]
    for tname, tid in TYPE2ID.items():
        out[tname] = {f"top{c}": res[tid][c] for c in keys}
    out["total"] = {
        f"top{c}": sum(TYPE_WEIGHTS[t] * out[t][f"top{c}"] for t in TYPES)
        for c in keys
    }
    return out
