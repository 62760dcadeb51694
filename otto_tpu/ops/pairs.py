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


# Tag multiplier packing the count-type index into the aid key:
# k1 = type_idx * AID_STRIDE + aid. 1 << 23 = 8.4M > the 1.8M OTTO aid space
# (reference: README.md:9-12); 5 types * stride = 42M << int32.
AID_STRIDE = 1 << 23


def plan_types_disjoint(plan: CoVisPlan) -> bool:
    """True when no (type_this, type_next) combination belongs to two count
    types — the condition for single-stream tagged emission. Holds for the
    reference's 5 count types (reference: config.py:81-88)."""
    seen = set()
    for tp in plan.types:
        for tn in tp.types_next:
            if (tp.type_this, tn) in seen:
                return False
            seen.add((tp.type_this, tn))
    return True


def emit_pairs_tagged(
    aid: jnp.ndarray,       # [S, L] int32, -1 padding
    ts: jnp.ndarray,        # [S, L] int32
    type_: jnp.ndarray,     # [S, L] int32
    plan: CoVisPlan,
    pad_to: int = 0,
    sess: jnp.ndarray = None,  # [S, L] int32 lane session id (filled rows)
):
    """Emit ONE type-tagged flat pair stream (k1, k2, valid).

    Same pair semantics as emit_pairs, but because the count types are
    disjoint in (type_this, type_next) — assert via plan_types_disjoint —
    each grid cell belongs to at most one type and the 5 streams collapse
    into one with k1 = type_idx * AID_STRIDE + aid_this. Downstream this
    makes the whole counting accumulation ONE sort-merge instead of five.

    pad_to > 0 pads the flat stream to a static length (uniform ladder run
    size across length buckets); padding lanes are invalid.

    sess (shelf-packed rows holding several whole sessions,
    data/batching.py::pack_sessions_filled) masks cross-session cells so
    one row's grid only emits within-session pairs.
    """
    S, L = aid.shape
    valid = aid >= 0

    a_i = aid[:, :, None]
    a_j = aid[:, None, :]
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
    if sess is not None:
        base = base & (sess[:, :, None] == sess[:, None, :])

    adt = jnp.abs(dt)
    tag = jnp.zeros((S, L, L), jnp.int32)
    any_m = jnp.zeros((S, L, L), bool)
    for idx, tp in enumerate(plan.types):
        next_ok = jnp.zeros_like(t_j, dtype=bool)
        for tn in tp.types_next:
            next_ok = next_ok | (t_j == tn)
        m = (t_i == tp.type_this) & next_ok & (adt <= tp.max_abs_dt)
        tag = jnp.where(m, idx, tag)
        any_m = any_m | m

    m = (base & any_m).reshape(-1)
    k1 = (tag * AID_STRIDE + jnp.broadcast_to(a_i, (S, L, L))).reshape(-1)
    k2 = jnp.broadcast_to(a_j, (S, L, L)).reshape(-1)
    if pad_to > S * L * L:
        pad = pad_to - S * L * L
        k1 = jnp.pad(k1, (0, pad))
        k2 = jnp.pad(k2, (0, pad))
        m = jnp.pad(m, (0, pad))
    return k1, k2, m
