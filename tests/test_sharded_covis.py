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
from otto_tpu.ops.pairs import AID_STRIDE
from otto_tpu.parallel.collectives import (
    gather_tagged_table,
    make_sharded_covis_update,
    make_sharded_table,
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
    table = make_sharded_table(1 << 14, mesh, axis="data")
    table = update(
        table,
        jnp.asarray(mb.aid), jnp.asarray(mb.ts), jnp.asarray(mb.type),
        jnp.zeros_like(jnp.asarray(mb.aid)),  # one session per row
    )

    got_by_type = gather_tagged_table(table, cfg.names)
    for name in cfg.names:
        a, b, c = got_by_type[name]
        ref = single_final[name]
        ra = np.asarray(ref.aid)[: int(ref.n)]
        rb = np.asarray(ref.aid_next)[: int(ref.n)]
        rc = np.asarray(ref.count)[: int(ref.n)]
        got = dict(zip(zip(a.tolist(), b.tolist()), c.tolist()))
        want = dict(zip(zip(ra.tolist(), rb.tolist()), rc.tolist()))
        assert got == want, f"shard mismatch for {name}"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_sharded_ownership():
    """Each shard's rows must satisfy (k1 % AID_STRIDE) % n_shards == shard."""
    cfg = CoVisConfig()
    plan = pairs_ops.make_plan(cfg)
    mesh_ctx = make_mesh(jax.devices()[:4], data_parallel=4, model_parallel=1)
    mesh = mesh_ctx.mesh
    ev = generate(SyntheticSpec(n_sessions=128, n_aids=200, max_len=16,
                                mean_len=6, seed=3))
    (padded,) = pack_sessions(ev, bucket_lens=(16,))
    (mb,) = list(iter_microbatches(padded, 128))
    update = make_sharded_covis_update(plan, mesh, axis="data")
    cap = 1 << 13
    table = make_sharded_table(cap, mesh, axis="data")
    table = update(
        table, jnp.asarray(mb.aid), jnp.asarray(mb.ts), jnp.asarray(mb.type),
        jnp.zeros_like(jnp.asarray(mb.aid)),
    )
    t = np.asarray(table.aid)
    c = np.asarray(table.count)
    for shard in range(4):
        rows = t[shard * cap : (shard + 1) * cap]
        cnts = c[shard * cap : (shard + 1) * cap]
        valid = cnts > 0
        assert valid.any()
        assert np.all((rows[valid] % AID_STRIDE) % 4 == shard)
