"""Negative downsampling, scoring, and top-k selection (C15, C17).

Downsampling (reference: model/downsample_retrieved.py:37-62): per target
type drop sessions without positives, keep at most
min(neg_to_pos_ratio * n_pos, max_neg_per_session) negatives per session
(seeded shuffle).

Scoring (reference: model/rank.py:46-59): score every retrieved candidate
with the target's ranker, ordinal-rank scores desc per session, keep top-k.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from otto_tpu.config import RankerConfig
from otto_tpu.engine.retrieval import RetrievedBatch
from otto_tpu.models.ranker import Ranker


def downsample(
    batches: List[RetrievedBatch],
    targets: List[np.ndarray],      # [S, C, 3] aligned with batches
    type_id: int,
    cfg: RankerConfig,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (feats [N, F], labels [N], sessions [N]) flat rows, session-sorted."""
    rng = np.random.default_rng(seed)
    feats_out, lab_out, sess_out = [], [], []
    for b, tgt in zip(batches, targets):
        S, C = b.cand.shape
        valid = b.cand >= 0
        y = tgt[:, :, type_id]
        n_pos = (y * valid).sum(axis=1)
        keep_sessions = n_pos > 0
        if not keep_sessions.any():
            continue
        max_neg = np.minimum(
            n_pos * cfg.neg_to_pos_ratio, cfg.max_neg_per_session
        )
        # random priority per negative; keep the max_neg smallest
        prio = rng.random((S, C))
        neg_mask = valid & (y == 0)
        # rank of each negative within its session by priority
        order = np.argsort(np.where(neg_mask, prio, 2.0), axis=1, kind="stable")
        rank = np.empty_like(order)
        np.put_along_axis(rank, order, np.arange(C)[None, :].repeat(S, 0), axis=1)
        keep_neg = neg_mask & (rank < max_neg[:, None])
        keep = (valid & (y > 0)) | keep_neg
        keep &= keep_sessions[:, None]
        si, ci = np.nonzero(keep)
        # device-side row gather -> only the selected rows cross the link
        feats_out.append(b.feats_rows(si, ci))
        lab_out.append(y[si, ci])
        sess_out.append(b.session[si])
    if not feats_out:
        raise ValueError(f"no positive sessions for type {type_id}")
    feats = np.concatenate(feats_out)
    labels = np.concatenate(lab_out)
    sessions = np.concatenate(sess_out)
    order = np.argsort(sessions, kind="stable")
    return feats[order], labels[order], sessions[order]


def score_and_topk(
    batches: List[RetrievedBatch],
    ranker: Ranker,
    top_k: int = 20,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (sessions [N], top-k aids [N, k] rank-ordered, scores [N, k])."""
    sess_out, aid_out, score_out = [], [], []
    for b in batches:
        S, C = b.cand.shape
        scores = ranker.predict(b.feats.reshape(-1, b.feats.shape[-1]))
        scores = scores.reshape(S, C)
        scores = np.where(b.cand >= 0, scores, -np.inf)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :top_k]
        top_aid = np.take_along_axis(b.cand, order, axis=1)
        top_score = np.take_along_axis(scores, order, axis=1)
        top_aid = np.where(np.isfinite(top_score), top_aid, -1)
        sess_out.append(b.session)
        aid_out.append(top_aid)
        score_out.append(top_score)
    sessions = np.concatenate(sess_out)
    aids = np.concatenate(aid_out)
    scores = np.concatenate(score_out)
    order = np.argsort(sessions, kind="stable")
    return sessions[order], aids[order], scores[order]


def write_submission(
    path: str,
    preds_by_type: dict,   # type name -> (sessions [N], aids [N, k])
) -> None:
    """Kaggle CSV `session_type,labels` (reference: model/submit.py:45-61)."""
    with open(path, "w") as fh:
        fh.write("session_type,labels\n")
        rows = []
        for tname, (sessions, aids) in preds_by_type.items():
            for s, row in zip(sessions, aids):
                labels = " ".join(str(int(a)) for a in row if a >= 0)
                rows.append((f"{int(s)}_{tname}", labels))
        rows.sort()
        for st, labels in rows:
            fh.write(f"{st},{labels}\n")


def read_submission(path: str) -> dict:
    """Parse back a submission CSV (reference: model/eval_submission.py:34-42)."""
    out = {}
    with open(path) as fh:
        next(fh)
        for line in fh:
            st, labels = line.rstrip("\n").split(",", 1)
            s, tname = st.rsplit("_", 1)
            aids = [int(a) for a in labels.split()] if labels else []
            out.setdefault(tname, {})[int(s)] = aids
    return out
