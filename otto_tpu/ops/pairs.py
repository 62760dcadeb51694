"""Windowed co-event pair emission over padded session tensors.

The reference implements co-visitation as a polars self-join per session
chunk: join on session, drop identical events, filter |dt| <= 24h, then
per-count-type filters (reference: model/count_co_events.py:17-77). Here the
same relation is a dense masked [S, L, L] pair grid — pure VPU elementwise
work that XLA fuses into a single pass — flattened into (aid, aid_next) key
streams for the sort-compress accumulator.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from otto_tpu.config import CoVisConfig


class PairBatch(NamedTuple):
    """Flattened pair keys for one count type."""

    aid: jnp.ndarray       # [P] int32
    aid_next: jnp.ndarray  # [P] int32
    valid: jnp.ndarray     # [P] bool


def emit_pairs(
    aid: jnp.ndarray,       # [S, L] int32, -1 padding
    ts: jnp.ndarray,        # [S, L] int32
    type_: jnp.ndarray,     # [S, L] int32
    cfg: CoVisConfig,
) -> Dict[str, PairBatch]:
    """Emit per-count-type (aid, aid_next) pair streams.

    Pair (i -> j) is kept when (reference: model/count_co_events.py:23-36,64-72):
      * both events valid, and not the identical event (i == j in the dense
        grid == identical (aid, ts, type) row after dedup)
      * min_time_to_next <= ts[j] - ts[i] <= max_time_to_next
      * type[i] == type_this, type[j] in types_next
      * |dt| <= per-type cap
    """
    S, L = aid.shape
    valid = aid >= 0

    a_i = aid[:, :, None]          # [S, L, 1] "this"
    a_j = aid[:, None, :]          # [S, 1, L] "next"
    dt = ts[:, None, :] - ts[:, :, None]          # ts_next - ts
    t_i = type_[:, :, None]
    t_j = type_[:, None, :]

    not_self = ~jnp.eye(L, dtype=bool)[None, :, :]
    base = (
        valid[:, :, None]
        & valid[:, None, :]
        & not_self
        & (dt >= cfg.min_time_to_next)
        & (dt <= cfg.max_time_to_next)
    )

    flat_a = jnp.broadcast_to(a_i, (S, L, L)).reshape(-1)
    flat_b = jnp.broadcast_to(a_j, (S, L, L)).reshape(-1)

    out: Dict[str, PairBatch] = {}
    for name, (type_this, types_next) in cfg.count_types.items():
        m = base & (t_i == type_this)
        next_ok = jnp.zeros_like(t_j, dtype=bool)
        for tn in types_next:
            next_ok = next_ok | (t_j == tn)
        m = m & next_ok
        cap = cfg.max_time_to_next_by_type[name]
        m = m & (jnp.abs(dt) <= cap)
        out[name] = PairBatch(flat_a, flat_b, m.reshape(-1))
    return out


def pair_budget_sessions(L: int, budget_pairs: int = 1 << 22) -> int:
    """How many sessions of padded length L fit a per-batch pair budget."""
    return max(1, budget_pairs // (L * L))
