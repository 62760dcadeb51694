"""JSONL ingestion (C6) with a native C++ fast path.

The reference converts Kaggle JSONL to parquet with pandas.read_json over
100k-session chunks (~15 min, reference: etl/jsonl_to_parquet.py:59-84).
Here the hot parse runs in native/jsonl_pack.cc (streaming single-pass
parser via ctypes); a pure-Python fallback keeps the path dependency-free
when the .so is not built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import json
import logging
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from otto_tpu.config import TYPE2ID
from otto_tpu.data.schema import Events, Labels

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = Path(__file__).resolve().parents[2] / "native" / "libotto_native.so"
    if not so.exists():
        log.info("native loader not built (%s missing); using Python parser", so)
        return None
    lib = ctypes.CDLL(str(so))
    pi32 = ctypes.POINTER(ctypes.c_int32)
    pi8 = ctypes.POINTER(ctypes.c_int8)
    lib.parse_sessions_jsonl.restype = ctypes.c_int64
    lib.parse_sessions_jsonl.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(pi32), ctypes.POINTER(pi32),
        ctypes.POINTER(pi32), ctypes.POINTER(pi8),
    ]
    lib.parse_labels_jsonl.restype = ctypes.c_int64
    lib.parse_labels_jsonl.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(pi32), ctypes.POINTER(pi8), ctypes.POINTER(pi32),
    ]
    lib.otto_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _take(lib, ptr, n, ctype, dtype) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)
    lib.otto_free(ptr)
    return arr


def load_sessions_jsonl(path: str, native: bool = True) -> Events:
    lib = _native_lib() if native else None
    if lib is not None:
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pi8 = ctypes.POINTER(ctypes.c_int8)
        s, a, t, ty = pi32(), pi32(), pi32(), pi8()
        n = lib.parse_sessions_jsonl(
            path.encode(), ctypes.byref(s), ctypes.byref(a),
            ctypes.byref(t), ctypes.byref(ty),
        )
        if n < 0:
            raise FileNotFoundError(path)
        return Events(
            _take(lib, s, n, ctypes.c_int32, np.int32),
            _take(lib, a, n, ctypes.c_int32, np.int32),
            _take(lib, t, n, ctypes.c_int32, np.int32),
            _take(lib, ty, n, ctypes.c_int8, np.int8),
        )
    return _load_sessions_python(path)


def load_labels_jsonl(path: str, native: bool = True) -> Labels:
    lib = _native_lib() if native else None
    if lib is not None:
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pi8 = ctypes.POINTER(ctypes.c_int8)
        s, ty, a = pi32(), pi8(), pi32()
        n = lib.parse_labels_jsonl(
            path.encode(), ctypes.byref(s), ctypes.byref(ty), ctypes.byref(a)
        )
        if n < 0:
            raise FileNotFoundError(path)
        return Labels(
            _take(lib, s, n, ctypes.c_int32, np.int32),
            _take(lib, ty, n, ctypes.c_int8, np.int8),
            _take(lib, a, n, ctypes.c_int32, np.int32),
        )
    return _load_labels_python(path)


# ---------------------------------------------------------------------------
# Pure-Python fallbacks (reference: etl/jsonl_to_parquet.py:32-56 semantics)
# ---------------------------------------------------------------------------
def _ts_seconds(ts: int) -> int:
    return ts // 1000 if ts > 100_000_000_000 else ts


def _load_sessions_python(path: str) -> Events:
    session, aid, ts, typ = [], [], [], []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            row = json.loads(line)
            sid = row["session"]
            for e in row["events"]:
                session.append(sid)
                aid.append(e["aid"])
                ts.append(_ts_seconds(e["ts"]))
                typ.append(TYPE2ID[e["type"]])
    return Events(
        np.asarray(session, np.int32), np.asarray(aid, np.int32),
        np.asarray(ts, np.int32), np.asarray(typ, np.int8),
    )


def _load_labels_python(path: str) -> Labels:
    session, typ, aid = [], [], []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            row = json.loads(line)
            sid = row["session"]
            for tname, aids in row["labels"].items():
                if not isinstance(aids, list):
                    aids = [aids]
                for a in aids:
                    session.append(sid)
                    typ.append(TYPE2ID[tname])
                    aid.append(a)
    return Labels(
        np.asarray(session, np.int32), np.asarray(typ, np.int8),
        np.asarray(aid, np.int32),
    )
