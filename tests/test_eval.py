"""Recall evaluator vs hand-computed cases (reference semantics:
model/eval_submission.py:44-63)."""
import numpy as np

from otto_tpu.data.schema import Labels
from otto_tpu.eval.recall import evaluate_topk, recall_at_k


def test_evaluate_topk_basic():
    # session 1: clicks label 5, predicted hit at rank 0
    # session 2: clicks label 7, predicted miss
    labels = Labels(
        session=np.array([1, 2, 1, 1], np.int32),
        type=np.array([0, 0, 1, 1], np.int8),
        aid=np.array([5, 7, 11, 12], np.int32),
    )
    sessions = np.array([1, 2], np.int32)
    aids = np.full((2, 20), -1, np.int32)
    aids[0, 0] = 5
    aids[0, 1] = 11
    aids[1, 0] = 99
    preds = {t: (sessions, aids) for t in ("clicks", "carts", "orders")}
    res = evaluate_topk(preds, labels)
    assert res["clicks"] == 0.5          # 1 of 2
    assert res["carts"] == 0.5           # hit 11 of {11, 12}
    assert res["orders"] == 0.0
    assert abs(res["total"] - (0.1 * 0.5 + 0.3 * 0.5)) < 1e-9


def test_truth_cap_at_20():
    # 30 order labels in one session; only 20 counted as truth
    labels = Labels(
        session=np.full(30, 1, np.int32),
        type=np.full(30, 2, np.int8),
        aid=np.arange(30, dtype=np.int32),
    )
    sessions = np.array([1], np.int32)
    aids = np.arange(20, dtype=np.int32)[None, :]
    preds = {t: (sessions, aids) for t in ("clicks", "carts", "orders")}
    res = evaluate_topk(preds, labels)
    assert res["orders"] == 1.0  # 20 hits / 20 capped truth


def test_session_without_prediction_counts_as_miss():
    labels = Labels(
        session=np.array([1, 2], np.int32),
        type=np.array([0, 0], np.int8),
        aid=np.array([5, 6], np.int32),
    )
    sessions = np.array([1], np.int32)  # no prediction for session 2
    aids = np.full((1, 20), -1, np.int32)
    aids[0, 0] = 5
    preds = {t: (sessions, aids) for t in ("clicks", "carts", "orders")}
    res = evaluate_topk(preds, labels)
    assert res["clicks"] == 0.5


def test_recall_at_k_cutoffs():
    labels = Labels(
        session=np.array([1], np.int32),
        type=np.array([0], np.int8),
        aid=np.array([42], np.int32),
    )
    sessions = np.array([1], np.int32)
    aids = np.full((1, 300), -1, np.int32)
    aids[0, 150] = 42  # hit at rank 151
    res = recall_at_k(sessions, aids, labels, cutoffs=(20, 100, 200))
    assert res["clicks"]["top20"] == 0.0
    assert res["clicks"]["top100"] == 0.0
    assert res["clicks"]["top200"] == 1.0
    assert res["clicks"]["topall"] == 1.0
