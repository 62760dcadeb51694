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


class FilledSessions(NamedTuple):
    """Dense rows holding MULTIPLE whole sessions each (shelf packing).

    Pair-grid lanes cost sorts downstream; single-session rows at OTTO
    session lengths (mean ~4 unique aids, p99 ~38 — reference README.md:18)
    leave [S, L, L] grids 85-95% dead. Packing whole sessions into full
    rows cuts lanes/event ~3-4x; the lane-wise `sess` id (-1 padding)
    lets the pair kernel mask cross-session cells.
    """

    aid: np.ndarray   # [S, L] int32, -1 padding
    ts: np.ndarray    # [S, L] int32, 0 padding
    type: np.ndarray  # [S, L] int32, 0 padding
    sess: np.ndarray  # [S, L] int32 original session id per lane, -1 padding

    @property
    def n_rows(self) -> int:
        return self.aid.shape[0]

    @property
    def max_len(self) -> int:
        return self.aid.shape[1]


def pack_sessions_filled(
    ev: Events,
    bucket_lens: Sequence[int] = (32, 512),
    keep: str = "last",
) -> List[FilledSessions]:
    """Shelf-pack whole sessions, several per row, one batch per bucket.

    Sessions are classed by exact length; a length-l class packs
    floor(L/l) sessions per row by reshape (fully vectorized, >=51%
    lane utilization per class). Sessions longer than the largest bucket
    keep their last `max(bucket_lens)` events, as in pack_sessions.
    """
    ev = ev.sort_by_session_ts()
    sess, starts, ends = _session_spans(ev)
    lens = (ends - starts).astype(np.int64)
    buckets = np.asarray(sorted(bucket_lens))
    max_l = int(buckets[-1])
    lens_c = np.minimum(lens, max_l)
    bucket_of = np.searchsorted(buckets, lens_c)

    out: List[FilledSessions] = []
    for bi, L in enumerate(buckets):
        m = bucket_of == bi
        if not m.any():
            continue
        b_sess = sess[m].astype(np.int32)
        b_lens = lens_c[m].astype(np.int64)
        b_starts = starts[m]
        b_ends = ends[m]
        gstart = (b_ends - b_lens) if keep == "last" else b_starts

        # per length class: row index + column offset by reshape arithmetic
        row_id = np.empty(len(b_sess), np.int64)
        col_off = np.empty(len(b_sess), np.int64)
        base_row = 0
        for l_val in np.unique(b_lens):
            idx = np.nonzero(b_lens == l_val)[0]
            k = max(1, int(L // l_val))
            seq = np.arange(len(idx))
            row_id[idx] = base_row + seq // k
            col_off[idx] = (seq % k) * l_val
            base_row += -(-len(idx) // k)

        S = int(base_row)
        tot = int(b_lens.sum())
        within = np.arange(tot) - np.repeat(
            np.concatenate([[0], np.cumsum(b_lens)[:-1]]), b_lens
        )
        src = np.repeat(gstart, b_lens) + within
        dst = np.repeat(row_id * L + col_off, b_lens) + within

        aid = np.full(S * L, -1, np.int32)
        ts_ = np.zeros(S * L, np.int32)
        typ = np.zeros(S * L, np.int32)
        sid = np.full(S * L, -1, np.int32)
        aid[dst] = ev.aid[src]
        ts_[dst] = ev.ts[src]
        typ[dst] = ev.type[src]
        sid[dst] = np.repeat(b_sess, b_lens)
        out.append(
            FilledSessions(
                aid.reshape(S, L), ts_.reshape(S, L),
                typ.reshape(S, L), sid.reshape(S, L),
            )
        )
    return out


def pad_filled(p: FilledSessions, to_rows: int) -> FilledSessions:
    """Pad the row axis up to a static size."""
    S, L = p.aid.shape
    if S == to_rows:
        return p
    assert S < to_rows
    pad = to_rows - S

    def _pad(a, fill):
        return np.concatenate(
            [a, np.full((pad, L), fill, a.dtype)], axis=0
        )

    return FilledSessions(
        _pad(p.aid, -1), _pad(p.ts, 0), _pad(p.type, 0), _pad(p.sess, -1)
    )


def iter_filled_microbatches(
    p: FilledSessions, batch_size: int, pad_last: bool = True
) -> Iterator[FilledSessions]:
    S = p.n_rows
    for i in range(0, S, batch_size):
        b = FilledSessions(*(a[i : i + batch_size] for a in p))
        if pad_last and b.n_rows < batch_size:
            b = pad_filled(b, batch_size)
        yield b


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
    (reference: model/count_co_events.py:92 df.unique()).

    lexsort + consecutive-equal mask: ~10x faster than
    np.unique(key, axis=0), which sorts rows as opaque byte strings.
    When (aid, ts, type) fit 62 bits (aid < 2^29, 0 <= ts, type < 4 — always
    true for OTTO-shaped data) they pack into ONE int64 minor key, halving
    the lexsort passes (~2x on the host-side share of covis counting)."""
    a64 = ev.aid.astype(np.int64)
    t64 = ev.ts.astype(np.int64)
    y64 = ev.type.astype(np.int64)
    if (
        len(ev)
        and 0 <= a64.min()
        and a64.max() < (1 << 29)
        and 0 <= t64.min()
        and t64.max() < (1 << 31)
        and 0 <= y64.min()
        and y64.max() < 4
    ):
        packed = (a64 << 33) | (t64 << 2) | y64
        order = np.lexsort((packed, ev.session))
        s = ev.session[order]
        p = packed[order]
        first = np.empty(len(order), bool)
        first[:1] = True
        first[1:] = (s[1:] != s[:-1]) | (p[1:] != p[:-1])
    else:
        order = np.lexsort((ev.type, ev.ts, ev.aid, ev.session))
        s = ev.session[order]
        a = ev.aid[order]
        t = ev.ts[order]
        ty = ev.type[order]
        first = np.empty(len(order), bool)
        first[:1] = True
        first[1:] = (
            (s[1:] != s[:-1]) | (a[1:] != a[:-1]) | (t[1:] != t[:-1])
            | (ty[1:] != ty[:-1])
        )
    idx = order[first]
    idx.sort()
    return ev.select(idx)
