"""Pallas TPU kernel: fused exact top-k similarity search (MIPS / L2).

The XLA path (otto_tpu.ops.knn) scans corpus tiles with lax.top_k merges —
correct, but every [Q_block, tile] score matrix and sort operand round-trips
through HBM. This kernel fuses matmul -> running top-k entirely in VMEM:

  grid = (Q // BQ, V // BV)       (corpus axis innermost)
  per step:  scores = q_tile @ c_tile.T on the MXU        [BQ, BV] f32
             iterative top-k extraction merged into the running [BQ, K]
             best-scores / best-index scratch (VPU selects, no sort)

HBM traffic: queries once per corpus sweep, corpus once per query block,
output [Q, K] once — the [Q, V] score matrix never exists.

Replaces faiss IndexIVFFlat (reference: model/w2vec_aids.py:98-110) with
EXACT search; k is small (20, reference: config.py:124) so the K-pass
extraction costs ~K*BV VPU ops against BQ*BV*D MXU flops per tile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.4e38  # python literal: jnp constants would be captured tracers


def _mips_kernel(q_ref, c_ref, qsq_ref, csq_ref, out_s_ref, out_i_ref,
                 best_s, best_i, *, k: int, bv: int, metric: str):
    ci = pl.program_id(1)
    n_ci = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.full_like(best_i, -1)

    # MXU: [BQ, D] x [D, BV]
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        # -||q - c||^2 = 2 q.c - ||q||^2 - ||c||^2 (csq carries the padding
        # penalty so padded corpus rows can never enter the top-k)
        scores = 2.0 * scores - qsq_ref[:] - csq_ref[:]
    else:
        scores = scores - csq_ref[:]  # csq is 0 / pad-penalty for 'dot'

    base = ci * bv
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base

    # candidate pool = this tile's scores ++ the running top-k entries;
    # K extract-max passes rebuild the (sorted desc) top-k — pure VPU
    # selects, no sort. Pool width is BV + K.
    s_ext = jnp.concatenate([scores, best_s[:]], axis=1)
    i_ext = jnp.concatenate([col_ids, best_i[:]], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, s_ext.shape, 1)
    big = jnp.int32(2**31 - 1)

    new_s = []
    new_i = []
    for _ in range(k):
        m = jnp.max(s_ext, axis=1, keepdims=True)                 # [BQ, 1]
        at = jnp.min(jnp.where(s_ext == m, pos, big), axis=1, keepdims=True)
        hit = pos == at
        idx = jnp.sum(jnp.where(hit, i_ext, 0), axis=1, keepdims=True)
        new_s.append(m)
        new_i.append(idx)
        s_ext = jnp.where(hit, NEG_INF, s_ext)

    best_s[:] = jnp.concatenate(new_s, axis=1)
    best_i[:] = jnp.concatenate(new_i, axis=1)

    @pl.when(ci == n_ci - 1)
    def _done():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def mips_topk_pallas(
    queries: jnp.ndarray,   # [Q, D]
    corpus: jnp.ndarray,    # [V, D]
    k: int,
    metric: str = "l2",
    bq: int = 256,
    bv: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k; returns (scores [Q, k], idx [Q, k]) sorted desc.
    Scores: inner product ('dot') or negated squared L2 ('l2')."""
    Q, D = queries.shape
    V = corpus.shape[0]
    Qp = (Q + bq - 1) // bq * bq
    Vp = (V + bv - 1) // bv * bv
    Dp = max(128, (D + 127) // 128 * 128)  # lane-align the feature dim
    q = jnp.pad(queries, ((0, Qp - Q), (0, Dp - D)))
    c = jnp.pad(corpus, ((0, Vp - V), (0, Dp - D)))
    D = Dp
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)                    # [Qp, 1]
    pad_penalty = jnp.where(jnp.arange(Vp) >= V, 1e37, 0.0)[None, :]
    if metric == "l2":
        c_sq = jnp.sum(c * c, axis=1)[None, :] + pad_penalty
    else:
        c_sq = pad_penalty

    kernel = functools.partial(_mips_kernel, k=k, bv=bv, metric=metric)
    grid = (Qp // bq, Vp // bv)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, D), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, D), lambda qi, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda qi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda qi, ci: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k), jnp.float32),
            pltpu.VMEM((bq, k), jnp.int32),
        ],
        interpret=interpret,
    )(q, c, q_sq, c_sq)

    out_s = out_s[:Q]
    out_i = out_i[:Q]
    # mask padding-corpus hits (only possible when V < k)
    bad = out_i >= V
    return jnp.where(bad, NEG_INF, out_s), jnp.where(bad, -1, out_i)
