"""JSONL ingestion: native C++ parser vs Python fallback vs ground truth."""
import json
import os
import subprocess

import numpy as np
import pytest

from otto_tpu.data import jsonl as J


@pytest.fixture(scope="module", autouse=True)
def build_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                   capture_output=True)


@pytest.fixture()
def sessions_file(tmp_path):
    rows = [
        {"session": 1, "events": [
            {"aid": 10, "ts": 1661724000000, "type": "clicks"},
            {"aid": 11, "ts": 1661724060000, "type": "carts"},
        ]},
        {"session": 2, "events": [
            {"aid": 12, "ts": 1661724120000, "type": "orders"},
        ]},
    ]
    p = tmp_path / "sessions.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


@pytest.fixture()
def labels_file(tmp_path):
    rows = [
        {"session": 1, "labels": {"clicks": 99, "carts": [5, 6], "orders": []}},
        {"session": 2, "labels": {"orders": [7]}},
    ]
    p = tmp_path / "labels.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def test_native_lib_loads():
    assert J._native_lib() is not None


def test_sessions_native_matches_python(sessions_file):
    ev_n = J.load_sessions_jsonl(sessions_file, native=True)
    ev_p = J.load_sessions_jsonl(sessions_file, native=False)
    for field in ("session", "aid", "ts", "type"):
        np.testing.assert_array_equal(
            getattr(ev_n, field), getattr(ev_p, field)
        )
    assert ev_n.session.tolist() == [1, 1, 2]
    assert ev_n.aid.tolist() == [10, 11, 12]
    assert ev_n.type.tolist() == [0, 1, 2]
    assert ev_n.ts.tolist() == [1661724000, 1661724060, 1661724120]  # ms -> s


def test_labels_native_matches_python(labels_file):
    la_n = J.load_labels_jsonl(labels_file, native=True)
    la_p = J.load_labels_jsonl(labels_file, native=False)
    def rows(la):
        return sorted(zip(la.session.tolist(), la.type.tolist(), la.aid.tolist()))
    assert rows(la_n) == rows(la_p)
    assert rows(la_n) == [(1, 0, 99), (1, 1, 5), (1, 1, 6), (2, 2, 7)]


def test_native_parses_large_file_fast(tmp_path):
    """Native parser must chew a 50k-event file well under a second."""
    import time
    rng = np.random.default_rng(0)
    lines = []
    for s in range(5000):
        events = [
            {"aid": int(rng.integers(0, 10000)),
             "ts": 1661724000000 + i * 1000,
             "type": ["clicks", "carts", "orders"][int(rng.integers(0, 3))]}
            for i in range(10)
        ]
        lines.append(json.dumps({"session": s, "events": events}))
    p = tmp_path / "big.jsonl"
    p.write_text("\n".join(lines))
    t = time.time()
    ev = J.load_sessions_jsonl(str(p), native=True)
    native_t = time.time() - t
    assert len(ev) == 50_000
    assert native_t < 1.0, native_t


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        J.load_sessions_jsonl("/nonexistent.jsonl", native=True)
