"""Train/test splitting with label generation.

The reference outsources this to the external `recsys-dataset` repo
(reference: etl/split_to_train_test.sh:4-9); here it is first-party since it
is load-bearing for eval parity (SURVEY.md §7 L0). Semantics follow the OTTO
organizers' testset carving:

* cutoff = max_ts - test_days
* train  = all events strictly before the cutoff (sessions spanning the
  cutoff are truncated; the truncated tail is discarded, as upstream does)
* test   = sessions starting at/after the cutoff; each is cut at a random
  index i in [1, len-1]: events[:i] stay visible, events[i:] become labels:
    - clicks: the FIRST future clicked aid (exactly one per session — see the
      label stats in reference: model/retrieve.py:723-727)
    - carts / orders: all unique future carted / ordered aids
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from otto_tpu.data.schema import Events, Labels

DAY = 24 * 60 * 60


@dataclasses.dataclass
class Split:
    train: Events
    test: Events          # truncated (visible) test sessions
    labels: Labels


def split_events(events: Events, test_days: int = 7, seed: int = 42) -> Split:
    ev = events.sort_by_session_ts()
    cutoff = int(ev.ts.max()) - test_days * DAY

    # session boundaries on the sorted table
    sess, starts = np.unique(ev.session, return_index=True)
    ends = np.append(starts[1:], len(ev))
    first_ts = ev.ts[starts]

    is_test_session = first_ts >= cutoff
    lens = ends - starts

    # ---- train: events before cutoff, excluding test sessions -------------
    # per-session flags expand to event level via repeat (the table is
    # session-sorted); an isin() over 2*10^8 events costs minutes, this ~1 s
    in_test = np.repeat(is_test_session, lens)
    train_mask = (ev.ts < cutoff) & ~in_test
    train = ev.select(train_mask)

    # ---- test: cut each test session at a random index --------------------
    rng = np.random.default_rng(seed)
    t_starts = starts[is_test_session]
    t_lens = lens[is_test_session]
    # sessions of length 1 can't be split; organizers drop them
    keep = t_lens >= 2
    t_starts, t_lens = t_starts[keep], t_lens[keep]
    cut = t_starts + 1 + (rng.random(len(t_lens)) * (t_lens - 1)).astype(np.int64)

    # visible part: [start, cut); label part: [cut, end) — expand the
    # per-session cut index to event level and compare against position
    kept_sess = np.zeros(len(sess), bool)
    kept_sess[np.flatnonzero(is_test_session)[keep]] = True
    cut_all = np.zeros(len(sess), np.int64)
    cut_all[kept_sess] = cut
    kept_ev = np.repeat(kept_sess, lens)
    cut_ev = np.repeat(cut_all, lens)
    idx = np.arange(len(ev), dtype=np.int64)
    vis_mask = kept_ev & (idx < cut_ev)
    lab_mask = kept_ev & (idx >= cut_ev)
    test = ev.select(vis_mask)

    lab = ev.select(lab_mask)
    labels = _labels_from_future(lab)
    return Split(train=train, test=test, labels=labels)


def _labels_from_future(fut: Events) -> Labels:
    """clicks -> first future click; carts/orders -> all unique future aids."""
    out_s, out_t, out_a = [], [], []

    order = np.lexsort((fut.ts, fut.session))
    s, a, t = fut.session[order], fut.aid[order], fut.type[order]

    # first future click per session
    click = t == 0
    if click.any():
        cs, ca = s[click], a[click]
        first_idx = np.unique(cs, return_index=True)[1]
        out_s.append(cs[first_idx])
        out_t.append(np.zeros(len(first_idx), np.int8))
        out_a.append(ca[first_idx])

    # all unique future carts / orders per session
    for type_id in (1, 2):
        m = t == type_id
        if not m.any():
            continue
        pairs = np.unique(
            np.stack([s[m].astype(np.int64), a[m].astype(np.int64)], 1), axis=0
        )
        out_s.append(pairs[:, 0].astype(np.int32))
        out_t.append(np.full(len(pairs), type_id, np.int8))
        out_a.append(pairs[:, 1].astype(np.int32))

    if not out_s:
        return Labels(np.array([], np.int32), np.array([], np.int8), np.array([], np.int32))
    return Labels(
        np.concatenate(out_s), np.concatenate(out_t), np.concatenate(out_a)
    )
