"""Sharded co-visitation counting: mesh-size invariance — the N-shard
all-to-all result must equal the single-device result (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otto_tpu.config import CoVisConfig
from otto_tpu.data.batching import iter_microbatches, pack_sessions
from otto_tpu.data.synthetic import SyntheticSpec, generate
from otto_tpu.engine.covis import CoVisCounter
from otto_tpu.ops import counts as counts_ops
from otto_tpu.ops import pairs as pairs_ops
from otto_tpu.parallel.collectives import (
    gather_table,
    make_sharded_covis_update,
    make_sharded_tables,
)
from otto_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_sharded_equals_single_device():
    cfg = CoVisConfig()
    plan = pairs_ops.make_plan(cfg)
    mesh_ctx = make_mesh(jax.devices()[:4], data_parallel=4, model_parallel=1)
    mesh = mesh_ctx.mesh

    ev = generate(SyntheticSpec(n_sessions=256, n_aids=400, max_len=24,
                                mean_len=8, seed=9))

    # single-device reference counts
    single = CoVisCounter(cfg, capacity=1 << 15, bucket_lens=(32,))
    single.update(ev)
    single_final = {
        name: counts_ops.finalize(t, 1, 10**9)
        for name, t in single.tables.items()
    }

    # sharded: one padded batch [S, 32], S divisible by 4
    (padded,) = pack_sessions(ev, bucket_lens=(32,))
    (mb,) = list(iter_microbatches(padded, 256))
    update = make_sharded_covis_update(plan, mesh, axis="data")
    tables = make_sharded_tables(len(cfg.names), 1 << 13, mesh, axis="data")
    tables = update(
        tables,
        jnp.asarray(mb.aid), jnp.asarray(mb.ts), jnp.asarray(mb.type),
    )

    for name, table in zip(cfg.names, tables):
        a, b, c = gather_table(table)
        ref = single_final[name]
        ra = np.asarray(ref.aid)[: int(ref.n)]
        rb = np.asarray(ref.aid_next)[: int(ref.n)]
        rc = np.asarray(ref.count)[: int(ref.n)]
        got = dict(zip(zip(a.tolist(), b.tolist()), c.tolist()))
        want = dict(zip(zip(ra.tolist(), rb.tolist()), rc.tolist()))
        assert got == want, f"shard mismatch for {name}"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_sharded_ownership():
    """Each shard's rows must satisfy aid % n_shards == shard_id."""
    cfg = CoVisConfig()
    plan = pairs_ops.make_plan(cfg)
    mesh_ctx = make_mesh(jax.devices()[:4], data_parallel=4, model_parallel=1)
    mesh = mesh_ctx.mesh
    ev = generate(SyntheticSpec(n_sessions=128, n_aids=200, max_len=16,
                                mean_len=6, seed=3))
    (padded,) = pack_sessions(ev, bucket_lens=(16,))
    (mb,) = list(iter_microbatches(padded, 128))
    update = make_sharded_covis_update(plan, mesh, axis="data")
    tables = make_sharded_tables(len(cfg.names), 1 << 12, mesh, axis="data")
    tables = update(
        tables, jnp.asarray(mb.aid), jnp.asarray(mb.ts), jnp.asarray(mb.type)
    )
    cap = 1 << 12
    t = np.asarray(tables[0].aid)
    c = np.asarray(tables[0].count)
    for shard in range(4):
        rows = t[shard * cap : (shard + 1) * cap]
        cnts = c[shard * cap : (shard + 1) * cap]
        valid = (cnts > 0)
        assert np.all(rows[valid] % 4 == shard)
