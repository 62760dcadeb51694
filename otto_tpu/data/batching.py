"""Ragged sessions -> dense padded device tensors.

The central representation change vs the reference (SURVEY.md §7 design
stance): sessions stop being DataFrame groups and become fixed-shape tensors
`aid/ts/type: [S, L]` + `length: [S]`, length-bucketed to bound padding waste
(sessions are 1-465 events, heavily skewed — reference: README.md:18).
"""
from __future__ import annotations

from typing import Iterator, List, NamedTuple, Sequence, Tuple

import numpy as np

from otto_tpu.data.schema import Events


class PaddedSessions(NamedTuple):
    """A pytree of dense session tensors. Padding lanes have aid == -1."""

    session: np.ndarray  # [S]    int32 original session ids
    aid: np.ndarray      # [S, L] int32, -1 padding
    ts: np.ndarray       # [S, L] int32, 0 padding
    type: np.ndarray     # [S, L] int32, 0 padding
    length: np.ndarray   # [S]    int32

    @property
    def n_sessions(self) -> int:
        return self.session.shape[0]

    @property
    def max_len(self) -> int:
        return self.aid.shape[1]

    def valid_mask(self) -> np.ndarray:
        return np.arange(self.max_len)[None, :] < self.length[:, None]


def _session_spans(ev: Events) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(session_ids, start, end) over a session-sorted event table."""
    sess, starts = np.unique(ev.session, return_index=True)
    ends = np.append(starts[1:], len(ev))
    return sess, starts, ends


def pack_sessions(
    ev: Events,
    bucket_lens: Sequence[int] = (8, 32, 128, 512),
    keep: str = "last",
) -> List[PaddedSessions]:
    """Pack a (session, ts)-sorted event table into one PaddedSessions batch
    per length bucket. Sessions longer than the largest bucket keep their
    `keep`='last' events (the retrieval layer's truncation semantics,
    reference: config.py:76-79)."""
    ev = ev.sort_by_session_ts()
    sess, starts, ends = _session_spans(ev)
    lens = (ends - starts).astype(np.int64)
    buckets = np.asarray(sorted(bucket_lens))
    max_l = int(buckets[-1])

    out: List[PaddedSessions] = []
    bucket_of = np.searchsorted(buckets, np.minimum(lens, max_l))
    for bi, L in enumerate(buckets):
        m = bucket_of == bi
        if not m.any():
            continue
        b_sess = sess[m]
        b_starts = starts[m]
        b_lens = np.minimum(lens[m], L).astype(np.int32)
        b_ends = ends[m]
        S = len(b_sess)
        # gather indices: last `b_lens` events of each session
        offs = np.arange(L)[None, :]
        gstart = (b_ends - b_lens)[:, None] if keep == "last" else b_starts[:, None]
        idx = gstart + offs
        pad = offs >= b_lens[:, None]
        idx = np.where(pad, 0, idx)
        aid = np.where(pad, -1, ev.aid[idx]).astype(np.int32)
        ts = np.where(pad, 0, ev.ts[idx]).astype(np.int32)
        typ = np.where(pad, 0, ev.type[idx]).astype(np.int32)
        out.append(PaddedSessions(b_sess.astype(np.int32), aid, ts, typ, b_lens))
    return out


def pad_batch(p: PaddedSessions, to_sessions: int) -> PaddedSessions:
    """Pad the session axis up to a static size (for fixed jit shapes /
    even device sharding)."""
    S, L = p.aid.shape
    if S == to_sessions:
        return p
    assert S < to_sessions
    padn = to_sessions - S
    return PaddedSessions(
        session=np.concatenate([p.session, np.full(padn, -1, np.int32)]),
        aid=np.concatenate([p.aid, np.full((padn, L), -1, np.int32)]),
        ts=np.concatenate([p.ts, np.zeros((padn, L), np.int32)]),
        type=np.concatenate([p.type, np.zeros((padn, L), np.int32)]),
        length=np.concatenate([p.length, np.zeros(padn, np.int32)]),
    )


def iter_microbatches(
    p: PaddedSessions, batch_size: int, pad_last: bool = True
) -> Iterator[PaddedSessions]:
    S = p.n_sessions
    for i in range(0, S, batch_size):
        b = PaddedSessions(*(a[i : i + batch_size] for a in p))
        if pad_last and b.n_sessions < batch_size:
            b = pad_batch(b, batch_size)
        yield b


def dedup_events(ev: Events) -> Events:
    """Drop exactly duplicated (session, aid, ts, type) rows
    (reference: model/count_co_events.py:92 df.unique())."""
    key = np.stack(
        [
            ev.session.astype(np.int64),
            ev.aid.astype(np.int64),
            ev.ts.astype(np.int64),
            ev.type.astype(np.int64),
        ],
        axis=1,
    )
    _, idx = np.unique(key, axis=0, return_index=True)
    idx.sort()
    return ev.select(idx)
