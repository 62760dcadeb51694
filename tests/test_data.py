"""Data layer tests: synthetic generator, splitter, batching."""
import numpy as np
import pytest

from otto_tpu.data.batching import dedup_events, pack_sessions, iter_microbatches
from otto_tpu.data.schema import Events, Labels
from otto_tpu.data.split import split_events
from otto_tpu.data.synthetic import SyntheticSpec, generate

DAY = 24 * 60 * 60


def test_generate_schema():
    ev = generate(SyntheticSpec(n_sessions=500, n_aids=1000, seed=1))
    assert ev.session.dtype == np.int32
    assert ev.type.dtype == np.int8
    assert set(np.unique(ev.type)) <= {0, 1, 2}
    assert ev.aid.min() >= 0 and ev.aid.max() < 1000
    # sessions sorted by (session, ts)
    assert np.all(np.diff(ev.session) >= 0)
    lens = np.bincount(ev.session - ev.session.min())
    assert lens[lens > 0].min() >= 2
    # funnel: clicks dominate
    frac_clicks = np.mean(ev.type == 0)
    assert frac_clicks > 0.6


def test_generate_device_matches_host_structure():
    """The lax.scan device generator must reproduce the host generator's
    learnable structure (not its exact RNG stream): schema, emission order,
    length/type/popularity/revisit distributions. At reference scale the
    host path costs ~20 min of the run; the device path is seconds."""
    from otto_tpu.data.synthetic import generate_device

    spec = SyntheticSpec(
        n_sessions=2000, n_aids=1500, max_len=32, mean_len=10, seed=3
    )
    ev = generate_device(spec, chunk_sessions=768)  # >1 chunk on purpose
    ref = generate(spec)
    assert ev.session.dtype == np.int32 and ev.type.dtype == np.int8
    # already (session, ts)-sorted — no host lexsort needed
    order = np.lexsort((ev.ts, ev.session))
    assert np.array_equal(order, np.arange(len(ev)))
    assert ev.session.min() == 0 and ev.session.max() == spec.n_sessions - 1
    lens = np.bincount(ev.session)
    assert lens.min() >= 2 and lens.max() <= spec.max_len
    assert abs(lens.mean() - np.bincount(ref.session).mean()) < 1.5
    assert set(np.unique(ev.type)) <= {0, 1, 2}
    for t in range(3):
        assert abs(np.mean(ev.type == t) - np.mean(ref.type == t)) < 0.03
    assert ev.aid.min() >= 0 and ev.aid.max() < spec.n_aids

    def top100_mass(e):
        c = np.bincount(e.aid, minlength=spec.n_aids)
        return np.sort(c)[-100:].sum() / len(e)

    assert abs(top100_mass(ev) - top100_mass(ref)) < 0.05

    def revisit_rate(e):
        seen, rep = set(), 0
        for s, a in zip(e.session.tolist(), e.aid.tolist()):
            if (s, a) in seen:
                rep += 1
            seen.add((s, a))
        return rep / len(e.session)

    assert abs(revisit_rate(ev) - revisit_rate(ref)) < 0.05


def test_generate_has_sequential_structure():
    """Co-visitation must be informative: items co-occur within categories."""
    spec = SyntheticSpec(n_sessions=2000, n_aids=2000, seed=2)
    ev = generate(spec)
    # successive events within a session should repeat aids more often than chance
    same = 0
    total = 0
    s = ev.session
    a = ev.aid
    for i in range(len(ev) - 1):
        if s[i] == s[i + 1]:
            total += 1
            if a[i] == a[i + 1]:
                same += 1
    assert same / total > 0.05  # revisits happen


def test_split_semantics():
    ev = generate(SyntheticSpec(n_sessions=3000, n_aids=500, span_days=28, seed=3))
    sp = split_events(ev, test_days=7, seed=0)
    cutoff = int(ev.ts.max()) - 7 * DAY
    # all train events strictly before cutoff
    assert sp.train.ts.max() < cutoff
    # test sessions start at/after cutoff
    t_sess, t_starts = np.unique(sp.test.session, return_index=True)
    ts_sorted = sp.test  # sorted already
    first_ts = ts_sorted.ts[t_starts]
    assert first_ts.min() >= cutoff
    # no overlap between train and test session ids
    assert not set(np.unique(sp.train.session)) & set(t_sess)
    # every labeled session is a visible test session
    assert set(np.unique(sp.labels.session)) <= set(t_sess)
    # clicks labels are unique per session
    cl = sp.labels.for_type(0)
    assert len(cl.session) == len(np.unique(cl.session))
    # labels exist
    assert len(sp.labels) > 0


def test_pack_sessions_roundtrip():
    ev = generate(SyntheticSpec(n_sessions=400, n_aids=300, max_len=40, seed=4))
    padded = pack_sessions(ev, bucket_lens=(8, 32, 64))
    total_sessions = sum(p.n_sessions for p in padded)
    assert total_sessions == len(np.unique(ev.session))
    # events survive packing (no session longer than largest bucket here)
    total_events = sum(int(p.length.sum()) for p in padded)
    assert total_events == len(ev)
    for p in padded:
        m = p.valid_mask()
        assert np.all(p.aid[m] >= 0)
        assert np.all(p.aid[~m] == -1)
        # ts non-decreasing within a session
        for i in range(min(5, p.n_sessions)):
            ln = p.length[i]
            assert np.all(np.diff(p.ts[i, :ln]) >= 0)


def test_pack_truncates_to_last():
    ev = Events(
        session=np.zeros(10, np.int32),
        aid=np.arange(10, dtype=np.int32),
        ts=np.arange(10, dtype=np.int32),
        type=np.zeros(10, np.int8),
    )
    (p,) = pack_sessions(ev, bucket_lens=(4,))
    assert p.length[0] == 4
    assert p.aid[0].tolist() == [6, 7, 8, 9]  # last 4 events


def test_iter_microbatches_pads():
    ev = generate(SyntheticSpec(n_sessions=10, n_aids=50, seed=5))
    (p,) = pack_sessions(ev, bucket_lens=(64,))
    bs = list(iter_microbatches(p, 4))
    assert all(b.n_sessions == 4 for b in bs)
    assert sum(int((b.session >= 0).sum()) for b in bs) == p.n_sessions


def test_dedup_events():
    ev = Events(
        session=np.array([1, 1, 1], np.int32),
        aid=np.array([5, 5, 5], np.int32),
        ts=np.array([10, 10, 11], np.int32),
        type=np.array([0, 0, 0], np.int8),
    )
    d = dedup_events(ev)
    assert len(d) == 2


def test_events_parquet_roundtrip(tmp_path):
    ev = generate(SyntheticSpec(n_sessions=50, n_aids=100, seed=6))
    path = str(tmp_path / "ev.parquet")
    ev.to_parquet(path)
    ev2 = Events.from_parquet(path)
    assert np.array_equal(ev.session, ev2.session)
    assert np.array_equal(ev.aid, ev2.aid)
    assert np.array_equal(ev.ts, ev2.ts)
    assert np.array_equal(ev.type, ev2.type)


def test_pack_sessions_filled_preserves_sessions():
    from otto_tpu.data.batching import pack_sessions_filled

    ev = generate(SyntheticSpec(n_sessions=400, n_aids=300, max_len=40, seed=4))
    filled = pack_sessions_filled(ev, bucket_lens=(8, 64))
    # every event lands in exactly one lane, with its session id
    got = {}
    for f in filled:
        m = f.sess >= 0
        assert np.all(f.aid[m] >= 0)
        assert np.all(f.aid[~m] == -1)
        for r in range(f.n_rows):
            row_m = m[r]
            for s in np.unique(f.sess[r][row_m]):
                sm = f.sess[r] == s
                # a session's lanes are contiguous and ts-sorted
                pos = np.nonzero(sm)[0]
                assert np.all(np.diff(pos) == 1)
                assert np.all(np.diff(f.ts[r][sm]) >= 0)
                assert s not in got  # whole session in ONE row
                got[int(s)] = (f.aid[r][sm], f.ts[r][sm], f.type[r][sm])
    assert len(got) == len(np.unique(ev.session))
    # per-session event content matches the raw table (no truncation here)
    order = np.lexsort((ev.ts, ev.session))
    sess_sorted = ev.session[order]
    for s in np.unique(ev.session)[:50]:
        sm = sess_sorted == s
        np.testing.assert_array_equal(got[int(s)][0], ev.aid[order][sm])


def test_pack_sessions_filled_fills_rows():
    from otto_tpu.data.batching import pack_sessions_filled

    # 10 sessions of length 4 pack 8-per-row into 32-lane rows
    n, l = 10, 4
    ev = Events(
        session=np.repeat(np.arange(n, dtype=np.int32), l),
        aid=np.tile(np.arange(l, dtype=np.int32) + 1, n),
        ts=np.tile(np.arange(l, dtype=np.int32), n),
        type=np.zeros(n * l, np.int8),
    )
    (f,) = pack_sessions_filled(ev, bucket_lens=(32,))
    assert f.n_rows == 2  # ceil(10 / 8)
    assert int((f.sess >= 0).sum()) == n * l


def test_pack_sessions_filled_truncates_to_last():
    from otto_tpu.data.batching import pack_sessions_filled

    ev = Events(
        session=np.zeros(10, np.int32),
        aid=np.arange(10, dtype=np.int32),
        ts=np.arange(10, dtype=np.int32),
        type=np.zeros(10, np.int8),
    )
    (f,) = pack_sessions_filled(ev, bucket_lens=(4,))
    assert f.aid[0].tolist() == [6, 7, 8, 9]
