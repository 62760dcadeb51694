"""Sharded co-visitation counting: shard_map + all-to-all count exchange.

The multi-host story of the reference is Dask task shuffles
(reference: dask_utils.py:9-32, SURVEY.md §5.8). Here the same dataflow is
SPMD: every device counts pairs over its session shard (data parallelism ==
the reference's chunked outer loop, model/count_co_events.py:83), then an
ALL-TO-ALL exchanges compressed (aid, aid_next, count) triples so that each
device owns the disjoint key range {aid : aid % n_shards == shard_id} — the
hierarchical merge (model/count_co_events.py:103-181) becomes a single
collective + local sort-compress merge, riding ICI instead of disk.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from otto_tpu.ops import counts as counts_ops
from otto_tpu.ops import pairs as pairs_ops
from otto_tpu.ops import segment as seg
from otto_tpu.ops.counts import CountTable

SENT = seg.SENTINEL


def _exchange_by_owner(ua, ub, uc, n_shards: int, axis: str):
    """Route compressed pair triples to their owner shard (aid % n_shards)
    via all_to_all. Inputs are per-device [P] arrays (SENTINEL padded);
    output: [n_shards * P] arrays of triples this shard owns."""
    Pn = ua.shape[0]
    valid = (ua != SENT) & (uc > 0)
    owner = jnp.where(valid, ua % n_shards, n_shards - 1)

    # sort by owner; compute within-owner position via segment starts
    owner_s, a_s, b_s, c_s = jax.lax.sort(
        (owner, ua, ub, uc), num_keys=1, is_stable=True
    )
    pos = jnp.arange(Pn, dtype=jnp.int32)
    starts = seg.segment_starts(owner_s)
    slot = pos - starts

    # scatter into [n_shards, P] send buffers (slot < P always: at most P
    # entries total per device)
    send_a = jnp.full((n_shards, Pn), SENT, jnp.int32).at[owner_s, slot].set(a_s)
    send_b = jnp.full((n_shards, Pn), SENT, jnp.int32).at[owner_s, slot].set(b_s)
    send_c = jnp.zeros((n_shards, Pn), jnp.int32).at[owner_s, slot].set(c_s)
    # re-mask invalid lanes that sorted to the tail of their owner bucket
    pad = send_a == SENT
    send_c = jnp.where(pad, 0, send_c)

    recv_a = jax.lax.all_to_all(send_a, axis, 0, 0, tiled=False)
    recv_b = jax.lax.all_to_all(send_b, axis, 0, 0, tiled=False)
    recv_c = jax.lax.all_to_all(send_c, axis, 0, 0, tiled=False)
    return recv_a.reshape(-1), recv_b.reshape(-1), recv_c.reshape(-1)


def make_sharded_covis_update(
    plan: pairs_ops.CoVisPlan,
    mesh: Mesh,
    axis: str = "data",
):
    """Build the jitted sharded update:
      (tables_sharded, aid [S, L], ts, type) -> tables_sharded
    where tables_sharded rows are sharded over `axis` (each shard's rows form
    an independent CountTable owning aid % n == shard_id) and the session
    batch is sharded over the same axis.
    """
    n = mesh.shape[axis]

    def per_shard(tables: Tuple[CountTable, ...], aid, ts, type_):
        streams = pairs_ops.emit_pairs(aid, ts, type_, plan)
        new_tables = []
        for (fa, fb, m), table in zip(streams, tables):
            ua, ub, uc, _ = counts_ops.compress_pairs(fa, fb, m)
            ra, rb, rc = _exchange_by_owner(ua, ub, uc, n, axis)
            # local combine of the received triples before the big merge
            ca, cb, cc, _ = seg.sort_compress(ra, rb, rc)
            # per-shard n is a length-1 vector (the sharded [n_shards] field)
            t = table._replace(n=table.n[0])
            t = counts_ops.merge_into_impl(t, ca, cb, cc)
            new_tables.append(t._replace(n=t.n.reshape(1)))
        return tuple(new_tables)

    table_spec = CountTable(
        aid=P(axis), aid_next=P(axis), count=P(axis), n=P(axis)
    )

    def spec_of(t):
        return table_spec

    tables_spec = None  # filled at call time by tree structure

    @partial(jax.jit, donate_argnums=(0,))
    def update(tables, aid, ts, type_):
        n_types = len(tables)
        in_specs = (
            tuple(table_spec for _ in range(n_types)),
            P(axis, None),
            P(axis, None),
            P(axis, None),
        )
        out_specs = tuple(table_spec for _ in range(n_types))
        fn = shard_map(
            per_shard, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return fn(tables, aid, ts, type_)

    return update


def make_sharded_tables(n_types: int, capacity_per_shard: int, mesh: Mesh,
                        axis: str = "data"):
    """Allocate count tables whose rows are sharded over `axis`. The global
    row count is n_shards * capacity_per_shard; shard k owns keys with
    aid % n_shards == k. The per-shard `n` scalar becomes a length-n_shards
    vector under sharding."""
    n = mesh.shape[axis]
    sh_rows = NamedSharding(mesh, P(axis))

    def alloc():
        return CountTable(
            aid=jax.device_put(
                jnp.full((n * capacity_per_shard,), SENT, jnp.int32), sh_rows
            ),
            aid_next=jax.device_put(
                jnp.full((n * capacity_per_shard,), SENT, jnp.int32), sh_rows
            ),
            count=jax.device_put(
                jnp.zeros((n * capacity_per_shard,), jnp.int32), sh_rows
            ),
            n=jax.device_put(jnp.zeros((n,), jnp.int32), sh_rows),
        )

    return tuple(alloc() for _ in range(n_types))


def gather_table(table: CountTable) -> CountTable:
    """Pull a sharded table to host as one merged (host-side) table: since
    shards own disjoint key ranges, concatenation + single compress gives
    the global counts."""
    import numpy as np

    a = np.asarray(table.aid)
    b = np.asarray(table.aid_next)
    c = np.asarray(table.count)
    valid = (a != int(SENT)) & (c > 0)
    a, b, c = a[valid], b[valid], c[valid]
    order = np.lexsort((b, a))
    return a[order], b[order], c[order]
