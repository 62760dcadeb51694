"""Batch scoring + packed meta pull over keep-filtered (padded-tail)
batches (round 4).

Batch contract (engine.retrieval.iter_run): `feats` arrive KEEP-FILTERED
to the real sessions ([n_keep, C, F]); `cand`/`ts_order` are handed over
as FULL [S, C] device arrays with `keep` recording the real-row indices
(cand_device() / the lazy host pull apply it). These tests pin that
contract for the device scorer, the stacked multi-target scorer, and the
single-pull pack_meta/unpack_meta pair the streaming passes rely on.
"""
import numpy as np
import jax.numpy as jnp

from otto_tpu.config import GBDTConfig
from otto_tpu.engine import rank as rank_engine
from otto_tpu.engine.retrieval import (
    FEATURE_INDEX,
    SOURCE_FLAGS,
    RetrievedBatch,
)
from otto_tpu.models.gbdt import GBDTRanker

S, C, K = 8, 6, 3
F = len(FEATURE_INDEX)


def tiny_ranker(seed=0):
    rng = np.random.default_rng(seed)
    cfg = GBDTConfig(n_trees=2, max_depth=2, n_bins=8)
    return GBDTRanker(
        cfg=cfg,
        edges=np.sort(rng.normal(size=(F, 7)), axis=1).astype(np.float32),
        gfeat=rng.integers(0, F, (2, 2, 2)).astype(np.int32),
        thr=rng.integers(1, 8, (2, 2, 2)).astype(np.int32),
        leaf=rng.normal(size=(2, 4)).astype(np.float32),
        feature_names=tuple(sorted(FEATURE_INDEX)),
    )


def padded_batch(n_keep, feats_np=None, cand_np=None):
    """iter_run-contract batch: feats keep-filtered, cand full + keep."""
    rng = np.random.default_rng(1)
    if feats_np is None:
        feats_np = rng.normal(size=(S, C, F)).astype(np.float32)
    if cand_np is None:
        cand_np = rng.integers(-1, 50, (S, C)).astype(np.int32)
    keep = None if n_keep == S else np.arange(n_keep)
    feats = feats_np if keep is None else feats_np[keep]
    return RetrievedBatch(
        session=np.arange(n_keep).astype(np.int32),
        cand=jnp.asarray(cand_np), feats=jnp.asarray(feats),
        ts_order=jnp.asarray(cand_np), keep=keep,
    )


def test_score_and_topk_keep_filtered_batch():
    b = padded_batch(n_keep=5)
    s, a, sc = rank_engine.score_and_topk([b], tiny_ranker(), top_k=K)
    assert s.shape == (5,) and a.shape == (5, K) and sc.shape == (5, K)
    # padded rows must not leak: sessions are exactly the kept ones
    assert sorted(s.tolist()) == list(range(5))


def test_score_topk_multi_matches_single():
    b = padded_batch(n_keep=5)
    rankers = [tiny_ranker(i) for i in range(3)]
    multi = rank_engine.score_topk_multi(b, rankers, top_k=K)
    assert multi is not None and multi.shape == (3, 5, K)
    for i, r in enumerate(rankers):
        b2 = padded_batch(n_keep=5)
        _, a, _ = rank_engine.score_and_topk([b2], r, top_k=K)
        np.testing.assert_array_equal(multi[i], a)


def test_pack_meta_roundtrip():
    rng = np.random.default_rng(2)
    cand_np = rng.integers(-1, 2_000_000, (S, C)).astype(np.int32)
    feats_np = np.zeros((S, C, F), np.float32)
    # set a deterministic flag pattern over the source columns
    want_flags = np.zeros((S, C), np.uint16)
    for k, name in enumerate(SOURCE_FLAGS):
        on = rng.random((S, C)) < 0.5
        feats_np[:, :, FEATURE_INDEX[name]] = on
        want_flags |= (on.astype(np.uint16) << k)
    b = padded_batch(n_keep=5, feats_np=feats_np, cand_np=cand_np)
    keep = np.arange(5)
    meta = b.pack_meta()
    flags = b.unpack_meta(meta)
    np.testing.assert_array_equal(b.cand, cand_np[keep])
    np.testing.assert_array_equal(flags, want_flags[keep])
    # ts_order's lazy pull still applies the keep filter after unpack
    np.testing.assert_array_equal(b.ts_order, cand_np[keep])


def test_device_source_eval_matches_host():
    """DeviceSourceEval (streaming on-device C14) must reproduce the host
    eval_retrieved_by_source report AND recall_at_k's ceiling numbers
    exactly, from the packed meta + label bits alone."""
    from otto_tpu.data.schema import Labels
    from otto_tpu.engine.retrieval import (
        join_labels, label_keys_device,
    )
    from otto_tpu.eval.per_source import (
        DeviceSourceEval,
        eval_retrieved_by_source,
    )
    from otto_tpu.eval.recall import recall_at_k

    rng = np.random.default_rng(11)
    Sb, Cb, n_aids = 16, 24, 200
    batches = []
    for bi in range(3):
        # unique candidates per session row, ragged tail padding
        cand_np = np.full((Sb, Cb), -1, np.int32)
        for i in range(Sb):
            n = int(rng.integers(3, Cb + 1))
            cand_np[i, :n] = rng.choice(n_aids, n, replace=False)
        feats_np = np.zeros((Sb, Cb, F), np.float32)
        valid = cand_np >= 0
        feats_np[:, :, FEATURE_INDEX["src_any"]] = valid
        for name in SOURCE_FLAGS[1:]:
            feats_np[:, :, FEATURE_INDEX[name]] = (
                (rng.random((Sb, Cb)) < 0.4) & valid
            )
        b = RetrievedBatch(
            session=(np.arange(Sb) + bi * Sb).astype(np.int32),
            cand=jnp.asarray(cand_np), feats=jnp.asarray(feats_np),
            ts_order=jnp.asarray(cand_np), keep=None,
        )
        batches.append(b)
    ls, la, lt = [], [], []
    for sess in range(3 * Sb + 4):        # a few label-only sessions too
        for _ in range(int(rng.integers(0, 5))):
            ls.append(sess)
            la.append(int(rng.integers(0, n_aids)))
            lt.append(int(rng.integers(0, 3)))
    labels = Labels(
        session=np.asarray(ls, np.int32), aid=np.asarray(la, np.int32),
        type=np.asarray(lt, np.int8),
    )
    # dedup (session, aid, type) triples: real labels are sets
    key = (np.asarray(ls, np.int64) * n_aids + np.asarray(la)) * 3 + lt
    _, ix = np.unique(key, return_index=True)
    labels = Labels(
        session=labels.session[ix], aid=labels.aid[ix], type=labels.type[ix]
    )

    lab_keys = label_keys_device(labels)
    dev = DeviceSourceEval(Cb)
    for b in batches:
        meta, tbits = b.pack_meta_labels(lab_keys)
        dev.update(meta, tbits)
    got = dev.finalize(labels)
    ceiling_got = got.pop("_ceiling")

    want = eval_retrieved_by_source(batches, labels, cutoffs=(20,))
    # host used cutoffs (20,) only where columns < 24; compare the shared
    # cutoffs on the full default set instead
    want = eval_retrieved_by_source(batches, labels)
    for name, by_type in want.items():
        if name == "_counts":
            for s, stats in by_type.items():
                for k2, v in stats.items():
                    assert abs(got["_counts"][s][k2] - v) < 1e-9, (s, k2)
            continue
        for tname, r in by_type.items():
            for ck, v in r.items():
                assert abs(got[name][tname][ck] - v) < 1e-12, (
                    name, tname, ck, got[name][tname][ck], v
                )
    ceiling_want = recall_at_k(
        np.concatenate([b.session for b in batches]),
        np.concatenate([b.cand for b in batches]),
        labels,
    )
    for tname, r in ceiling_want.items():
        for ck, v in r.items():
            assert abs(ceiling_got[tname][ck] - v) < 1e-12, (tname, ck)


def test_pack_meta_labels_matches_host_join():
    """The device label join (pack_meta_labels' target bits) must equal
    join_labels' host searchsorted join bit-for-bit."""
    from otto_tpu.data.schema import Labels
    from otto_tpu.engine.retrieval import join_labels, label_keys_device

    rng = np.random.default_rng(7)
    n_aids = 40
    cand_np = rng.integers(-1, n_aids, (S, C)).astype(np.int32)
    b = padded_batch(n_keep=5, cand_np=cand_np)
    # labels over a superset of the batch's sessions, some hits guaranteed
    ls, la, lt = [], [], []
    for sess in range(8):
        for _ in range(rng.integers(1, 4)):
            ls.append(sess)
            la.append(int(rng.integers(0, n_aids)))
            lt.append(int(rng.integers(0, 3)))
    # force known hits: session 0's first two real candidates
    for tid in (0, 2):
        ls.append(0)
        la.append(int(max(cand_np[0, 0], 0)))
        lt.append(tid)
    labels = Labels(
        session=np.asarray(ls, np.int32),
        aid=np.asarray(la, np.int32),
        type=np.asarray(lt, np.int8),
    )
    got = b.pack_meta_labels(label_keys_device(labels))
    assert got is not None
    meta, bits_dev = got
    b.unpack_meta(meta)
    bits = np.asarray(bits_dev)
    tgt = join_labels([b], labels)[0]          # [n_keep, C, 3] host oracle
    for tid in range(3):
        np.testing.assert_array_equal(
            (bits >> tid) & 1, tgt[:, :, tid].astype(np.uint8)
        )
