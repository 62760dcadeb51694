"""Synthetic OTTO-like session generator.

The Kaggle dataset is not redistributable and is absent from this environment,
so the framework ships a generator producing sessions with the same schema and
the same *learnable structure* the reference pipeline exploits
(reference: README.md:9-18 scale; SURVEY.md §6 scale constants):

* zipf item popularity           -> popularity retrieval signal (C12)
* latent item categories with
  within-category transitions    -> co-visitation + w2vec signal (C7, C8)
* item revisits within a session -> the 'self' source (model/retrieve.py:259)
* click -> cart -> order funnel  -> type-conditioned co-count matrices

Sessions are generated fully vectorized over a [S, L] grid.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from otto_tpu.data.schema import Events

DAY = 24 * 60 * 60


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    n_sessions: int = 10_000
    n_aids: int = 20_000
    max_len: int = 64
    mean_len: float = 15.0
    cat_size: int = 50           # latent category size
    zipf_a: float = 1.2          # popularity skew
    p_revisit: float = 0.25      # next event revisits an earlier session item
    p_neighbor: float = 0.45     # next event stays within the latent category
    p_cart: float = 0.10         # a click upgrades to a cart
    p_order_after_cart: float = 0.25  # a carted item later produces an order
    span_days: int = 28          # dataset time span
    seed: int = 0


def _zipf_draw(rng: np.random.Generator, spec: SyntheticSpec, size) -> np.ndarray:
    """Item ids with zipf popularity; id == popularity rank."""
    u = rng.random(size)
    # inverse-CDF of a truncated zipf via power transform (cheap, adequate)
    ranks = (spec.n_aids ** (u ** spec.zipf_a)).astype(np.int64) - 1
    return np.clip(ranks, 0, spec.n_aids - 1).astype(np.int32)


def generate(spec: SyntheticSpec) -> Events:
    rng = np.random.default_rng(spec.seed)
    S, L = spec.n_sessions, spec.max_len

    # latent categories via a fixed permutation of the item space
    perm = rng.permutation(spec.n_aids).astype(np.int32)
    perm_inv = np.argsort(perm).astype(np.int32)

    lengths = np.clip(
        rng.lognormal(np.log(spec.mean_len), 0.7, S).astype(np.int32), 2, L
    )

    aid = np.zeros((S, L), np.int32)
    typ = np.zeros((S, L), np.int8)
    carted = np.full((S, 4), -1, np.int32)  # ring buffer of carted aids
    n_carted = np.zeros(S, np.int32)

    aid[:, 0] = _zipf_draw(rng, spec, S)

    for t in range(1, L):
        u = rng.random(S)
        cur = aid[:, t - 1]

        # neighbour jump within latent category
        slot = perm[cur] // spec.cat_size * spec.cat_size + rng.integers(
            0, spec.cat_size, S
        )
        nbr = perm_inv[np.clip(slot, 0, spec.n_aids - 1)]

        # revisit an earlier item of the session
        back = rng.integers(0, t, S)
        prev = aid[np.arange(S), back]

        fresh = _zipf_draw(rng, spec, S)

        nxt = np.where(
            u < spec.p_revisit,
            prev,
            np.where(u < spec.p_revisit + spec.p_neighbor, nbr, fresh),
        )
        aid[:, t] = nxt

        # types: click by default; upgrade to cart; carted items may order
        is_cart = rng.random(S) < spec.p_cart
        can_order = n_carted > 0
        is_order = (rng.random(S) < spec.p_order_after_cart) & can_order & ~is_cart
        typ[:, t] = np.where(is_cart, 1, np.where(is_order, 2, 0)).astype(np.int8)

        # an order re-targets a previously carted item
        pick = rng.integers(0, 4, S) % np.maximum(n_carted, 1)
        ordered_aid = carted[np.arange(S), pick]
        aid[:, t] = np.where(is_order, ordered_aid, aid[:, t])

        # push carts into the ring buffer
        ring_pos = n_carted % 4
        carted[is_cart, ring_pos[is_cart]] = aid[is_cart, t]
        n_carted = n_carted + is_cart.astype(np.int32)

    # timestamps: session start uniform over the span, exp gaps (median ~1min)
    start = rng.integers(0, spec.span_days * DAY, S)[:, None]
    gaps = rng.exponential(90.0, (S, L)).astype(np.int64) + 1
    ts = (start + np.cumsum(gaps, axis=1)).astype(np.int32)

    # flatten honoring per-session lengths
    mask = np.arange(L)[None, :] < lengths[:, None]
    session_ids = np.broadcast_to(
        np.arange(S, dtype=np.int32)[:, None], (S, L)
    )
    ev = Events(
        session=session_ids[mask],
        aid=aid[mask],
        ts=ts[mask],
        type=typ[mask],
    )
    return ev.sort_by_session_ts()
