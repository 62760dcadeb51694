"""Mesh-size invariance for the three per-stage sharded paths wired in
round 3 (session embeddings, popularity counting, kNN) plus the CLI mesh
spec parser: N-shard results must equal 1-shard results (SURVEY.md §4
'mesh-size-invariance checks')."""
import jax
import numpy as np
import pytest

from otto_tpu.config import CoVisConfig, PopularityConfig
from otto_tpu.data.batching import pack_sessions
from otto_tpu.data.synthetic import SyntheticSpec, generate
from otto_tpu.parallel.mesh import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 devices"
)


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(jax.devices()[:4], data_parallel=4, model_parallel=1)


@needs_devices
def test_session_embeddings_sharded_matches_single(mesh4):
    from otto_tpu.engine.session_embed import compute_session_embeddings

    ev = generate(SyntheticSpec(n_sessions=500, n_aids=400, mean_len=6, seed=3))
    rng = np.random.default_rng(0)
    table = rng.normal(size=(400, 32)).astype(np.float32)
    packs = pack_sessions(ev, bucket_lens=(8, 32))
    s1, e1 = compute_session_embeddings(packs, table)
    sn, en = compute_session_embeddings(packs, table, mesh_ctx=mesh4)
    np.testing.assert_array_equal(s1, sn)
    # both paths round to f16 on device (halves the stage's device->host
    # bytes) with identical arithmetic, so results stay bit-equal — the
    # 1-vs-N pipeline ceiling invariance depends on this
    np.testing.assert_allclose(e1, en, rtol=0, atol=0)


def test_session_embeddings_stacked_f16_close_to_exact():
    """The production single-device path (one stacked [3, S, L] upload,
    f16 pull) must match the exact f32 batch program to f16 precision."""
    import jax.numpy as jnp

    from otto_tpu.engine.session_embed import (
        _session_embedding_batch_stacked,
        session_embedding_batch,
    )

    ev = generate(SyntheticSpec(n_sessions=300, n_aids=200, mean_len=6, seed=5))
    rng = np.random.default_rng(0)
    table = rng.normal(size=(200, 32)).astype(np.float32)
    for p in pack_sessions(ev, bucket_lens=(8, 32)):
        exact = np.asarray(session_embedding_batch(
            jnp.asarray(p.aid), jnp.asarray(p.ts), jnp.asarray(p.type),
            jnp.asarray(table),
        ))
        fast = np.asarray(_session_embedding_batch_stacked(
            jnp.asarray(np.stack([p.aid, p.ts, p.type])), jnp.asarray(table)
        )).astype(np.float32)
        np.testing.assert_allclose(fast, exact, rtol=2e-3, atol=2e-3)


@needs_devices
def test_popularity_sharded_matches_single(mesh4):
    from otto_tpu.engine.popularity import compute_popularity

    ev = generate(SyntheticSpec(n_sessions=600, n_aids=300, mean_len=7, seed=9))
    rng = np.random.default_rng(1)
    cl = rng.integers(0, 5, len(ev)).astype(np.int32)
    cfg = PopularityConfig()
    p1 = compute_popularity(ev, cl, 5, 300, cfg, event_budget=1 << 10)
    pn = compute_popularity(
        ev, cl, 5, 300, cfg, event_budget=1 << 10, mesh_ctx=mesh4
    )
    np.testing.assert_array_equal(p1.candidate, pn.candidate)
    np.testing.assert_array_equal(p1.ranks, pn.ranks)
    np.testing.assert_array_equal(p1.aid_rank, pn.aid_rank)


@needs_devices
def test_knn_sharded_matches_single(mesh4):
    from otto_tpu.ops.knn import knn_search

    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(700, 24)).astype(np.float32)
    queries = corpus[:300]
    s1, i1 = knn_search(queries, corpus, 8, metric="l2", backend="xla",
                        query_block=128)
    sn, in_ = knn_search(queries, corpus, 8, metric="l2", backend="xla",
                         query_block=128, mesh_ctx=mesh4)
    np.testing.assert_allclose(s1, sn, rtol=1e-5, atol=1e-5)
    # ties can reorder between backends; compare the neighbour SETS per row
    for r in range(len(queries)):
        assert set(i1[r]) == set(in_[r])


def test_parse_mesh_spec():
    from otto_tpu.pipeline.cli import parse_mesh_spec

    assert parse_mesh_spec(None) is None
    assert parse_mesh_spec("") is None
    assert parse_mesh_spec("data=4") == {
        "data_parallel": 4, "model_parallel": 1
    }
    assert parse_mesh_spec("data=4,model=2") == {
        "data_parallel": 4, "model_parallel": 2
    }
    assert parse_mesh_spec("model=2") == {
        "data_parallel": -1, "model_parallel": 2
    }
    with pytest.raises(ValueError):
        parse_mesh_spec("rows=2")
    with pytest.raises(ValueError):
        parse_mesh_spec("data")


@needs_devices
def test_cli_mesh_run_synthetic(tmp_path):
    """Operator surface: `otto-tpu run-synthetic --mesh data=4` must run the
    full pipeline sharded and produce sane metrics (VERDICT item 4)."""
    import json

    from otto_tpu.pipeline.cli import main

    out = tmp_path / "work"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "run-synthetic", "--tiny", "--sessions", "1200", "--aids", "600",
            "--batch-sessions", "64", "--work-dir", str(out),
            "--mesh", "data=4",
        ])
    assert rc == 0
    metrics = json.loads(buf.getvalue())
    assert metrics["ceiling_total"] > 0.2
    assert metrics["total"] > 0.05


@needs_devices
def test_sgns_model_parallel_matches_single():
    """Row-sharded SGNS (model axis) must reproduce single-device chunk-mode
    training: same rng stream, gathers are psum-of-one-owner (exact), so
    embeddings match to float tolerance (VERDICT item 5)."""
    import dataclasses

    from otto_tpu.config import Word2VecConfig
    from otto_tpu.models.word2vec import train_word2vec_device

    ev = generate(SyntheticSpec(n_sessions=400, n_aids=300, mean_len=8,
                                seed=13))
    cfg = Word2VecConfig(
        name="t", types=(0, 1, 2), vector_size=16, window=4, min_count=1,
        epochs=1, batch_size=512, steps_per_dispatch=4,
        # block_k=0: MP keeps the legacy per-pair sampler, so bit-parity
        # with single-device requires the legacy sampler there too (the
        # block sampler draws a different index stream by design)
        neg_sharing="chunk", knn_k=5, subsample_t=0, block_k=0,
    )
    m_single = train_word2vec_device(ev, cfg)
    ctx = make_mesh(jax.devices()[:4], data_parallel=1, model_parallel=4)
    m_mp = train_word2vec_device(ev, cfg, mesh_ctx=ctx)
    assert m_single.emb.shape == m_mp.emb.shape
    np.testing.assert_allclose(m_single.emb, m_mp.emb, rtol=2e-4, atol=2e-5)
