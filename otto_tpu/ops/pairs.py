"""Windowed co-event pair emission over padded session tensors.

The reference implements co-visitation as a polars self-join per session
chunk: join on session, drop identical events, filter |dt| <= 24h, then
per-count-type filters (reference: model/count_co_events.py:17-77). Here the
same relation is a dense masked [S, L, L] pair grid — pure VPU elementwise
work that XLA fuses into a single pass — flattened into (aid, aid_next) key
streams for the sort-compress accumulator.

The count-type spec is a hashable static "plan" so the whole
emit -> compress -> merge step compiles into ONE program per bucket shape.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CountTypePlan(NamedTuple):
    """Static per-count-type spec (hashable, jit-static)."""

    name: str
    type_this: int
    types_next: Tuple[int, ...]
    max_abs_dt: int


class CoVisPlan(NamedTuple):
    """Static covis spec (reference: config.py:41-49,81-88)."""

    types: Tuple[CountTypePlan, ...]
    min_time_to_next: int
    max_time_to_next: int


def make_plan(cfg) -> CoVisPlan:
    """Build the static plan from a CoVisConfig."""
    return CoVisPlan(
        types=tuple(
            CountTypePlan(
                name=name,
                type_this=cfg.count_types[name][0],
                types_next=tuple(cfg.count_types[name][1]),
                max_abs_dt=cfg.max_time_to_next_by_type[name],
            )
            for name in cfg.names
        ),
        min_time_to_next=cfg.min_time_to_next,
        max_time_to_next=cfg.max_time_to_next,
    )


def emit_pairs(
    aid: jnp.ndarray,       # [S, L] int32, -1 padding
    ts: jnp.ndarray,        # [S, L] int32
    type_: jnp.ndarray,     # [S, L] int32
    plan: CoVisPlan,
):
    """Emit per-count-type (aid, aid_next, valid) flat pair streams.

    Pair (i -> j) is kept when (reference: model/count_co_events.py:23-36,64-72):
      * both events valid, and not the identical event (i == j in the dense
        grid == identical (aid, ts, type) row after dedup)
      * min_time_to_next <= ts[j] - ts[i] <= max_time_to_next
      * type[i] == type_this, type[j] in types_next, |dt| <= per-type cap
    """
    S, L = aid.shape
    valid = aid >= 0

    a_i = aid[:, :, None]          # "this"
    a_j = aid[:, None, :]          # "next"
    dt = ts[:, None, :] - ts[:, :, None]
    t_i = type_[:, :, None]
    t_j = type_[:, None, :]

    not_self = ~jnp.eye(L, dtype=bool)[None, :, :]
    base = (
        valid[:, :, None]
        & valid[:, None, :]
        & not_self
        & (dt >= plan.min_time_to_next)
        & (dt <= plan.max_time_to_next)
    )

    flat_a = jnp.broadcast_to(a_i, (S, L, L)).reshape(-1)
    flat_b = jnp.broadcast_to(a_j, (S, L, L)).reshape(-1)

    out = []
    for tp in plan.types:
        m = base & (t_i == tp.type_this)
        next_ok = jnp.zeros_like(t_j, dtype=bool)
        for tn in tp.types_next:
            next_ok = next_ok | (t_j == tn)
        m = m & next_ok & (jnp.abs(dt) <= tp.max_abs_dt)
        out.append((flat_a, flat_b, m.reshape(-1)))
    return out


def pair_budget_sessions(L: int, budget_pairs: int = 1 << 22) -> int:
    """How many sessions of padded length L fit a per-batch pair budget."""
    return max(1, budget_pairs // (L * L))
