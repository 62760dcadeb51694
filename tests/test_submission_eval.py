"""Submission write -> independent re-parse -> eval cross-check (C18/C19
+ the organizer-scorer role of eval_submission_otto.sh)."""
import numpy as np

from otto_tpu.data.schema import Labels
from otto_tpu.engine.rank import read_submission, write_submission
from otto_tpu.eval.recall import evaluate_submission_file, evaluate_topk


def test_submission_roundtrip_and_eval(tmp_path):
    sessions = np.array([3, 1], np.int32)
    aids = np.array([[5, 7, -1], [9, -1, -1]], np.int32)
    preds = {
        "clicks": (sessions, aids),
        "carts": (sessions, aids),
        "orders": (sessions, aids),
    }
    path = str(tmp_path / "sub.csv")
    write_submission(path, preds)

    parsed = read_submission(path)
    assert parsed["clicks"][3] == [5, 7]
    assert parsed["orders"][1] == [9]

    labels = Labels(
        session=np.array([3, 1], np.int32),
        type=np.array([0, 2], np.int8),
        aid=np.array([7, 9], np.int32),
    )
    direct = evaluate_topk(preds, labels)
    reparsed = evaluate_submission_file(path, labels)
    assert abs(direct["total"] - reparsed["total"]) < 1e-12
    assert reparsed["clicks"] == 1.0
    assert reparsed["orders"] == 1.0


def test_submission_csv_format(tmp_path):
    sessions = np.array([12], np.int32)
    aids = np.array([[1, 2, 3]], np.int32)
    preds = {"clicks": (sessions, aids), "carts": (sessions, aids),
             "orders": (sessions, aids)}
    path = str(tmp_path / "sub.csv")
    write_submission(path, preds)
    lines = open(path).read().splitlines()
    assert lines[0] == "session_type,labels"
    # rows sorted, format "session_type,aid aid aid" (reference: model/submit.py:45-50)
    assert "12_clicks,1 2 3" in lines
