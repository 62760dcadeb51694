"""Histogram gradient-boosted decision trees with LambdaRank, TPU-native.

Model-class parity with the reference ranker: LightGBM `lambdarank` GBDT,
150 trees / depth 4 / lr 0.25 / colsample 0.25 / subsample 0.5 /
min_child_samples 20, ndcg@20 (reference: config.py:207-227,
model/train_lgbm_rankers.py:110-129). LightGBM grows trees on CPU with
per-feature histogram scans; that translation would be scalar poison on TPU,
so this is a redesign around the MXU:

  * features are quantile-binned to uint8 once (host), then live on device;
  * per-level histograms H[f, b, node, {grad,hess,count}] are built as a
    ONE-HOT x MATMUL contraction `einsum('cfb,cd->fbd')` over row chunks —
    histogramming becomes dense bf16 matmul work instead of scatter-adds
    (TPU scatters measured ~1000x slower than gathers, see ops/segment.py);
  * trees are complete depth-D binary trees built level-wise ("no-op" splits
    send every row left, so control flow stays static);
  * the ENTIRE boosting loop (lambda grads -> 4 level builds -> leaf values
    -> score update, x n_trees) is one `lax.scan` dispatch — zero host
    round-trips during training (tunneled runtimes pay ~80ms/dispatch);
  * LambdaRank gradients/hessians are exact pairwise |dNDCG@k|-weighted
    logistic lambdas over padded session groups, with LightGBM's per-query
    lambda normalization (log2(1+sum|lambda|)/sum|lambda|).

Trees are stored as dense arrays (feat [T, D, W], threshold-bin [T, D, W],
leaf [T, 2^D]); prediction is a `lax.scan` over trees with 4 gathers per
tree per row.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.config import GBDTConfig
from otto_tpu.models.ranker import _group_pad, ndcg_at_k

__all__ = ["GBDTConfig", "GBDTRanker", "train_gbdt_ranker"]


# ---------------------------------------------------------------------------
# host-side quantile binning
# ---------------------------------------------------------------------------

def compute_bin_edges(
    feats: np.ndarray, n_bins: int, sample: int = 1 << 20, seed: int = 0
) -> np.ndarray:
    """[N, F] float -> [F, n_bins-1] ascending bin edges (quantiles).

    bin(x) = #edges <= x, so edges must be strictly increasing; duplicate
    quantiles (constant-ish features) are collapsed by padding with +inf
    (rows then land in low bins, never splitting on the degenerate range).
    """
    n, f = feats.shape
    if n > sample:
        idx = np.random.default_rng(seed).choice(n, sample, replace=False)
        feats = feats[idx]
    feats = feats.astype(np.float32, copy=False)  # f16 masters quantile fine
    qs = np.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    edges = np.quantile(feats, qs, axis=0).T.astype(np.float32)  # [F, B-1]
    out = np.full_like(edges, np.inf)
    for j in range(f):
        u = np.unique(edges[j])
        u = u[np.isfinite(u)]
        out[j, : len(u)] = u
    return out


def bin_features(feats: np.ndarray, edges: np.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """[N, F] float, [F, B-1] edges -> [N, F] uint8 bin ids (edge <= x count).

    Column-wise np.searchsorted (C binary search) instead of the dense
    [N, F, B] comparison: binning 350k x 104 rows dropped from ~10 s to
    ~0.5 s on the 2-core host — this runs once per ranker model so the
    uint8 bins (not the 4x-bigger floats) can cross the host->device link.
    """
    n, f = feats.shape
    out = np.empty(feats.shape, np.uint8)
    for j in range(f):
        out[:, j] = np.searchsorted(
            edges[j], feats[:, j].astype(np.float32), side="right"
        ).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# lambdarank gradients (device)
# ---------------------------------------------------------------------------

def _lambda_grads_chunk(scores, labels, mask, maxdcg, sigma, k, norm):
    """scores/labels/mask [C, G], maxdcg [C] -> grad, hess [C, G]."""
    G = scores.shape[1]
    s = jnp.where(mask, scores, -jnp.inf)
    order = jnp.argsort(-s, axis=1)
    rank = jnp.zeros_like(order).at[
        jnp.arange(s.shape[0])[:, None], order
    ].set(jnp.arange(G)[None, :])
    disc = jnp.where(rank < k, 1.0 / jnp.log2(2.0 + rank.astype(jnp.float32)), 0.0)
    delta = jnp.abs(disc[:, :, None] - disc[:, None, :]) / jnp.maximum(
        maxdcg, 1e-9
    )[:, None, None]

    y = jnp.where(mask, labels, 0.0)
    win = (y[:, :, None] > y[:, None, :]) & mask[:, :, None] & mask[:, None, :]
    sd = scores[:, :, None] - scores[:, None, :]
    rho = jax.nn.sigmoid(-sigma * sd)               # [C, G, G]
    lam = jnp.where(win, sigma * rho * delta, 0.0)
    hes = jnp.where(win, sigma * sigma * rho * (1.0 - rho) * delta, 0.0)

    grad = -lam.sum(2) + lam.sum(1)                 # winners pushed up
    hess = hes.sum(2) + hes.sum(1)

    if norm:
        sum_l = jnp.abs(lam).sum(axis=(1, 2))       # per-query |lambda| mass
        scale = jnp.where(
            sum_l > 0, jnp.log2(1.0 + sum_l) / jnp.maximum(sum_l, 1e-12), 0.0
        )[:, None]
        grad = grad * scale
        hess = hess * scale
    return grad, hess


def _max_dcg(labels: jnp.ndarray, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Ideal DCG@k per group, [NG, G] -> [NG]."""
    G = labels.shape[1]
    n_pos = jnp.sum(labels * mask, axis=1)
    pos = jnp.arange(G, dtype=jnp.float32)[None, :]
    disc = jnp.where(
        pos < jnp.minimum(n_pos, float(k))[:, None], 1.0 / jnp.log2(2.0 + pos), 0.0
    )
    return disc.sum(1)


# ---------------------------------------------------------------------------
# tree building (device, inside the boosting scan)
# ---------------------------------------------------------------------------

def _histograms(bins_sub, node, gh3, n_nodes_w, n_bins, row_chunk,
                axis_name=None):
    """bins_sub [N, Fs] int32, node [N] int32, gh3 [N, 3] f32 ->
    [Fs, n_bins, W*3] f32 where W = n_nodes_w.

    One-hot x matmul over row chunks: the MXU does the binning reduction.
    The node-weighted gradient block (node_onehot x gh3, [chunk, W*3]) is
    built INSIDE the chunk body — materializing it at full N (f32 [N, W*3],
    ~2.3 GB at 6M rows / depth 6) OOMs the chip.
    Rows are zero-padded to a row_chunk multiple (pad rows carry zero gh3).
    """
    n, fs = bins_sub.shape
    pad = (-n) % row_chunk
    if pad:
        bins_sub = jnp.pad(bins_sub, ((0, pad), (0, 0)))
        node = jnp.pad(node, (0, pad))
        gh3 = jnp.pad(gh3, ((0, pad), (0, 0)))
    n_chunks = (n + pad) // row_chunk
    bins_c = bins_sub.reshape(n_chunks, row_chunk, fs)
    node_c = node.reshape(n_chunks, row_chunk)
    gh3_c = gh3.reshape(n_chunks, row_chunk, 3)

    def body(acc, xs):
        bc, nc, gc = xs
        node_oh = (
            nc[:, None] == jnp.arange(n_nodes_w)[None, :]
        ).astype(jnp.float32)                              # [C, W]
        ghc = (node_oh[:, :, None] * gc[:, None, :]).reshape(
            bc.shape[0], n_nodes_w * 3
        )                                                  # [C, W*3]
        onehot = (
            bc.astype(jnp.int32)[:, :, None] == jnp.arange(n_bins)[None, None, :]
        ).astype(jnp.bfloat16)
        acc = acc + jnp.einsum(
            "cfb,cd->fbd", onehot, ghc.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((fs, n_bins, n_nodes_w * 3), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (bins_c, node_c, gh3_c))
    if axis_name is not None:
        # data-parallel GBDT: rows are sharded, histograms are tiny — the
        # all-reduce here is the only cross-device traffic per tree level
        acc = jax.lax.psum(acc, axis_name)
    return acc


def _build_tree(bins_sub, grad, hess, cnt, cfg: GBDTConfig, axis_name=None):
    """One complete depth-D tree, level-wise.

    bins_sub [N, Fs] int32 (feature-subsampled), grad/hess/cnt [N] f32
    (cnt is 0 for padded/bagged-out rows). Returns (feat_local [D, W],
    thr [D, W], gain [D, W], leaf [2^D], node [N]) where W = 2^(D-1) max
    nodes/level and thr == n_bins means "no-op split, all rows left".
    """
    depth, n_bins = cfg.max_depth, cfg.n_bins
    W = 1 << (depth - 1)
    n_leaves = 1 << depth
    N = bins_sub.shape[0]
    node = jnp.zeros(N, jnp.int32)
    feat_arr = jnp.zeros((depth, W), jnp.int32)
    thr_arr = jnp.full((depth, W), n_bins, jnp.int32)
    gain_arr = jnp.zeros((depth, W), jnp.float32)

    gh3 = jnp.stack([grad, hess, cnt], axis=-1)            # [N, 3]
    for level in range(depth):
        n_nodes = 1 << level
        H = _histograms(
            bins_sub, node, gh3, W, n_bins, cfg.row_chunk, axis_name
        )
        H = H.reshape(-1, n_bins, W, 3)

        cum = jnp.cumsum(H, axis=1)                    # left stats for thr=b+1
        tot = cum[:, -1:, :, :]
        gl, hl, cl = cum[..., 0], cum[..., 1], cum[..., 2]
        gt, ht, ct = tot[..., 0], tot[..., 1], tot[..., 2]
        gr, hr, cr = gt - gl, ht - hl, ct - cl
        l2 = cfg.lambda_l2
        gain = (
            gl * gl / (hl + l2 + 1e-9)
            + gr * gr / (hr + l2 + 1e-9)
            - gt * gt / (ht + l2 + 1e-9)
        )
        ok = (
            (cl >= cfg.min_child_samples)
            & (cr >= cfg.min_child_samples)
            & (hl >= cfg.min_child_hessian)
            & (hr >= cfg.min_child_hessian)
        )
        gain = jnp.where(ok, gain, -jnp.inf)           # [Fs, B, W]
        flat = gain.reshape(-1, W)                     # [(Fs*B), W]
        best = jnp.argmax(flat, axis=0)                # [W]
        best_gain = jnp.take_along_axis(flat, best[None, :], axis=0)[0]
        bf = best // n_bins                            # feature (local)
        bb = best % n_bins                             # last-left bin
        do_split = (best_gain > 1e-12) & (jnp.arange(W) < n_nodes)
        thr = jnp.where(do_split, bb + 1, n_bins)      # go right iff bin >= thr
        bf = jnp.where(do_split, bf, 0)
        feat_arr = feat_arr.at[level].set(bf)
        thr_arr = thr_arr.at[level].set(thr)
        gain_arr = gain_arr.at[level].set(
            jnp.where(do_split, best_gain, 0.0)
        )

        # route rows: row_bin = bins_sub[n, bf[node[n]]], thr_n = thr[node[n]].
        # NO dynamic gathers (a [N, Fs] take_along_axis is ~100x off roofline
        # on v5e, ARCHITECTURE.md lesson 7): the per-node (feature, threshold)
        # tables are W-way arithmetic selects, and the per-row feature fetch
        # is a one-hot masked reduction over the Fs columns (pure VPU).
        fcol = jnp.zeros(N, jnp.int32)
        thr_n = jnp.zeros(N, jnp.int32)
        for w in range(W):
            hit = node == w
            fcol = jnp.where(hit, bf[w], fcol)
            thr_n = jnp.where(hit, thr[w], thr_n)
        col_ids = jnp.arange(bins_sub.shape[1], dtype=jnp.int32)[None, :]
        row_bin = jnp.sum(
            jnp.where(col_ids == fcol[:, None], bins_sub, 0), axis=1
        )
        node = node * 2 + (row_bin >= thr_n).astype(jnp.int32)

    leaf_onehot = (node[:, None] == jnp.arange(n_leaves)[None, :]).astype(
        jnp.bfloat16
    )
    gh = jnp.stack([grad, hess, cnt], axis=-1).astype(jnp.bfloat16)  # [N, 3]
    sums = jnp.einsum(
        "nl,nc->lc", leaf_onehot, gh, preferred_element_type=jnp.float32
    )
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    leaf = jnp.where(
        sums[:, 2] > 0,
        -sums[:, 0] / (sums[:, 1] + cfg.lambda_l2 + 1e-9) * cfg.learning_rate,
        0.0,
    )
    return feat_arr, thr_arr, gain_arr, leaf, node


# ---------------------------------------------------------------------------
# the fused boosting loop
# ---------------------------------------------------------------------------

def _pad_axis0(x: np.ndarray, mult: int, fill=0) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return np.concatenate([x, np.full((pad, *x.shape[1:]), fill, x.dtype)])


def _train_core(bins, labels_g, mask_g, cfg: GBDTConfig, axis_name=None,
                scores0=None, tree_ids=None):
    """bins [NG*G, F] uint8 (grouped-flat: row g*G+j <-> group g slot j),
    labels_g/mask_g [NG, G]. Returns stacked trees + final (local) scores.

    scores0/tree_ids carry state across chunked boosting dispatches: the
    driver runs `trees_per_dispatch` trees per device execution (a whole
    150-tree run in one dispatch trips remote-runtime execution deadlines
    at ~10M rows) and feeds each chunk the previous chunk's scores plus
    the global tree indices (which seed per-tree rng).

    With axis_name set (inside shard_map), the arrays are the per-device
    shards; split decisions are computed from psum'd histograms, so every
    device grows the IDENTICAL tree — classic data-parallel GBDT, with
    per-level histogram all-reduce as the only communication."""
    NG, G = labels_g.shape
    N, F = bins.shape
    Fs = max(1, int(round(cfg.colsample * F)))
    maxdcg = _max_dcg(labels_g, mask_g, cfg.ndcg_at)
    n_gchunks = NG // cfg.group_chunk
    key0 = jax.random.PRNGKey(cfg.seed)

    def grads_for(scores_g):
        sc = scores_g.reshape(n_gchunks, cfg.group_chunk, G)
        lc = labels_g.reshape(n_gchunks, cfg.group_chunk, G)
        mc = mask_g.reshape(n_gchunks, cfg.group_chunk, G)
        dc = maxdcg.reshape(n_gchunks, cfg.group_chunk)

        def body(_, xs):
            s, l, m, d = xs
            return None, _lambda_grads_chunk(
                s, l, m, d, cfg.sigma, cfg.ndcg_at, cfg.lambda_norm
            )

        _, (g, h) = jax.lax.scan(body, None, (sc, lc, mc, dc))
        return g.reshape(NG * G), h.reshape(NG * G)

    def boost_step(scores, t):
        key = jax.random.fold_in(key0, t)
        k_feat, k_bag = jax.random.split(key)
        if axis_name is not None:
            # same feature subset everywhere; bagging differs per shard
            k_bag = jax.random.fold_in(k_bag, jax.lax.axis_index(axis_name))
        feat_idx = jax.random.permutation(k_feat, F)[:Fs]          # [Fs]
        bag = (
            jax.random.uniform(k_bag, (NG * G,)) < cfg.subsample
        ).astype(jnp.float32)

        grad, hess = grads_for(scores.reshape(NG, G))
        cnt = mask_g.reshape(NG * G).astype(jnp.float32) * bag
        grad, hess = grad * bag, hess * bag
        # column subsample via one-hot MATMUL, not take(): a [N, Fs] dynamic
        # column gather per tree was the dominant training cost (~100x off
        # roofline). Bin ids < 256 are exact in bf16.
        sel = (feat_idx[None, :] == jnp.arange(F)[:, None]).astype(jnp.bfloat16)
        bins_sub = jax.lax.dot(
            bins.astype(jnp.bfloat16), sel,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                        # [N, Fs]
        feat_l, thr, gain, leaf, node = _build_tree(
            bins_sub, grad, hess, cnt, cfg, axis_name
        )
        # leaf[node] as a 2^D-way select (flat 1-D gathers are pathological)
        add = jnp.zeros(N, jnp.float32)
        for l in range(leaf.shape[0]):
            add = jnp.where(node == l, leaf[l], add)
        scores = scores + add
        gfeat = feat_idx[feat_l]                                   # global ids
        return scores, (gfeat, thr, gain, leaf)

    if scores0 is None:
        scores0 = jnp.zeros(N, jnp.float32)
    if tree_ids is None:
        tree_ids = jnp.arange(cfg.n_trees)
    scores, (gfeat, thr, gain, leaf) = jax.lax.scan(
        boost_step, scores0, tree_ids
    )
    return gfeat, thr, gain, leaf, scores


@partial(jax.jit, static_argnames=("cfg",))
def _train_program(bins, labels_g, mask_g, cfg: GBDTConfig,
                   scores0=None, tree_ids=None):
    return _train_core(bins, labels_g, mask_g, cfg,
                       scores0=scores0, tree_ids=tree_ids)


def _train_program_dp(bins, labels_g, mask_g, cfg: GBDTConfig, mesh, axis: str,
                      scores0=None, tree_ids=None):
    """Data-parallel boosting over a mesh axis: groups (and their rows) are
    sharded along `axis`; trees come back replicated. The dp analogue of the
    reference's DaskLGBMRanker(tree_learner_type='data_parallel')
    (reference: model/train_lgbm_rankers.py:110-116)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if scores0 is None:
        scores0 = jnp.zeros(bins.shape[0], jnp.float32)
    if tree_ids is None:
        tree_ids = jnp.arange(cfg.n_trees)

    def core(b, lg, mg, s0, tids):
        return _train_core(b, lg, mg, cfg, axis_name=axis,
                           scores0=s0, tree_ids=tids)

    fn = shard_map(
        core,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        # split tables + gains come from psum'd histograms -> replicated
        out_specs=(P(), P(), P(), P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)(bins, labels_g, mask_g, scores0, tree_ids)


@jax.jit
def _bin_program(x, edges):
    """Device-side quantile binning: x [M, F] f32, edges [F, B-1] ->
    [M, F] uint8. The host-numpy `bin_features` is O(M*F*B) comparisons on
    2 cores; here it's B-1 vectorized passes over x (a scan, so the [M, F, B]
    comparison tensor is never materialized)."""

    def body(acc, e):  # e: [F] — one edge per feature
        return acc + (x >= e[None, :]).astype(jnp.int32), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros(x.shape, jnp.int32), jnp.transpose(edges)
    )
    return acc.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("n_bins",))
def _predict_binned_program(bins, gfeat, thr, leaf, n_bins: int):
    """bins [M, F] uint8; trees gfeat/thr [T, D, W], leaf [T, 2^D] -> [M].

    Traversal is vectorized ACROSS trees: node state is [M, T]; per level
    the (feature, threshold) table lookups become W arithmetic selects
    (W = 2^(D-1) is tiny) and the per-row feature-bin fetch is ONE batched
    row gather [M, F] -> [M, T] (the Pallas vreg-gather kernel on TPU —
    the previous scan-over-trees did T*D pathological row gathers, ~600
    per call, which made scoring the dominant pipeline stage)."""
    bins = bins.astype(jnp.int32)
    M = bins.shape[0]
    T, depth, W = gfeat.shape
    n_leaves = leaf.shape[1]

    def bytree(table_col):  # [T] -> broadcast [M, T]
        return jnp.broadcast_to(table_col[None, :], (M, T))

    from otto_tpu.ops.segment import _pallas_gather_mode

    mode = _pallas_gather_mode()
    node = jnp.zeros((M, T), jnp.int32)
    for level in range(depth):
        gl = gfeat[:, level, :]                      # [T, W]
        tl_ = thr[:, level, :]
        f = jnp.zeros((M, T), jnp.int32)
        t_thr = jnp.zeros((M, T), jnp.int32)
        for w in range(W):                            # W tiny selects
            hit = node == w
            f = jnp.where(hit, bytree(gl[:, w]), f)
            t_thr = jnp.where(hit, bytree(tl_[:, w]), t_thr)
        if mode != "off":
            from otto_tpu.ops.pallas.gather import gather_rows

            b = gather_rows(
                bins[None], f, block_s=32, interpret=mode == "interpret"
            )[0]
        else:
            b = jnp.take_along_axis(bins, f, axis=1)
        node = node * 2 + (b >= t_thr).astype(jnp.int32)

    val = jnp.zeros((M, T), jnp.float32)
    for l in range(n_leaves):
        val = jnp.where(node == l, bytree(leaf[:, l]), val)
    return val.sum(axis=1)


@partial(jax.jit, static_argnames=("n_bins",))
def _predict_program(x, edges, gfeat, thr, leaf, n_bins: int):
    """Fused bin + traverse: raw features [M, F] f32 -> scores [M]."""
    return _predict_binned_program(
        _bin_program(x, edges), gfeat, thr, leaf, n_bins
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GBDTRanker:
    """Trained GBDT lambdarank model (LightGBM booster analogue, C16/C17)."""

    cfg: GBDTConfig
    edges: np.ndarray        # [F, B-1] bin edges
    gfeat: np.ndarray        # [T, D, W] split feature (global id)
    thr: np.ndarray          # [T, D, W] split bin threshold (n_bins = no-op)
    leaf: np.ndarray         # [T, 2^D] leaf values
    feature_names: Tuple[str, ...]
    gains: Optional[np.ndarray] = None  # [T, D, W] split gains (0 = no-op)
    # best valid iteration/score (reference: utils.py:77-93 extracts
    # best_iteration_/best_score_; falls back to n_estimators when no
    # valid set / no early stopping)
    best_iter: int = -1                 # -1 = unknown -> len(leaf)
    best_score: float = float("nan")    # valid ndcg@k at best_iter

    def predict_scores_device(self, feats: "jnp.ndarray") -> "jnp.ndarray":
        """Device-resident scoring: feats [..., F] on device -> scores [...]
        with NO host round-trip (the np predict() below pulls the feature
        tensor through the host link — ~100 MB/batch on retrieval output)."""
        shape = feats.shape[:-1]
        flat = feats.reshape(-1, feats.shape[-1]).astype(jnp.float32)
        scores = _predict_program(
            flat,
            jnp.asarray(self.edges),
            jnp.asarray(self.gfeat),
            jnp.asarray(self.thr),
            jnp.asarray(self.leaf),
            self.cfg.n_bins,
        )
        return scores.reshape(shape)

    def predict(self, feats: np.ndarray, batch: int = 1 << 16) -> np.ndarray:
        """Host-array scoring: bin on host, ship uint8 (4x less tunnel
        traffic than f32 features — the link, not the chip, is the cost)."""
        n = feats.shape[0]
        out = np.empty(n, np.float32)
        bins = bin_features(np.asarray(feats, np.float32), self.edges)
        tf, tt, tl = (
            jnp.asarray(self.gfeat),
            jnp.asarray(self.thr),
            jnp.asarray(self.leaf),
        )
        for i in range(0, n, batch):
            x = bins[i : i + batch]
            if x.shape[0] < batch and n > batch:
                x = np.pad(x, ((0, batch - x.shape[0]), (0, 0)))  # one shape
            out[i : i + batch] = np.asarray(
                _predict_binned_program(
                    jnp.asarray(x), tf, tt, tl, self.cfg.n_bins
                )
            )[: n - i]
        return out

    def feature_importance(self, importance_type: str = "gain") -> np.ndarray:
        """Per-feature importance (reference reports gain importance,
        model/train_lgbm_rankers.py:132-144). 'gain' sums split gains,
        'split' counts splits; gain falls back to split for models trained
        before gains were recorded."""
        used = self.thr < self.cfg.n_bins
        n_feats = len(self.feature_names)
        if importance_type == "gain" and self.gains is not None:
            return np.bincount(
                self.gfeat[used].reshape(-1),
                weights=self.gains[used].reshape(-1),
                minlength=n_feats,
            )
        return np.bincount(
            self.gfeat[used].reshape(-1), minlength=n_feats
        ).astype(np.int64)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            edges=self.edges,
            gfeat=self.gfeat,
            thr=self.thr,
            leaf=self.leaf,
            gains=(
                self.gains
                if self.gains is not None
                else np.zeros((0,), np.float32)
            ),
            feature_names=np.array(self.feature_names),
            best=np.array([float(self.best_iter), self.best_score], np.float64),
            cfg=np.frombuffer(
                repr(dataclasses.asdict(self.cfg)).encode(), dtype=np.uint8
            ),
        )

    @staticmethod
    def load(path: str) -> "GBDTRanker":
        z = np.load(path, allow_pickle=False)
        import ast

        cfg = GBDTConfig(**ast.literal_eval(bytes(z["cfg"].tobytes()).decode()))
        gains = z["gains"] if "gains" in z.files else np.zeros((0,), np.float32)
        best = z["best"] if "best" in z.files else np.array([-1.0, np.nan])
        return GBDTRanker(
            cfg=cfg,
            edges=z["edges"],
            gfeat=z["gfeat"],
            thr=z["thr"],
            leaf=z["leaf"],
            gains=gains if gains.size else None,
            feature_names=tuple(z["feature_names"].tolist()),
            best_iter=int(best[0]),
            best_score=float(best[1]),
        )


def train_gbdt_ranker(
    feats: np.ndarray,           # [N, F] flat candidate rows
    labels: np.ndarray,          # [N] 0/1 target for ONE type
    group_sessions: np.ndarray,  # [N] session id per row
    feature_names: Tuple[str, ...],
    cfg: GBDTConfig = GBDTConfig(),
    valid: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    mesh=None,
    mesh_axis: str = "data",
) -> GBDTRanker:
    """Bin features, group rows by session, run the fused boosting program.

    With `mesh`, training is data-parallel over `mesh_axis`: session groups
    are sharded across devices and per-level histograms are all-reduced."""
    import logging

    log = logging.getLogger(__name__)

    def _cap_groups(f, y, s, cap, tag):
        u = np.unique(s)
        if not cap or len(u) <= cap:
            return f, y, s
        keep_s = np.random.default_rng(cfg.seed).choice(u, cap, replace=False)
        m = np.isin(s, keep_s)
        log.info(
            "gbdt %s: capping %d groups (%d rows) to %d groups (%d rows)",
            tag, len(u), len(s), cap, int(m.sum()),
        )
        return f[m], y[m], s[m]

    feats, labels, group_sessions = _cap_groups(
        feats, labels, group_sessions,
        int(getattr(cfg, "max_train_groups", 0) or 0), "train",
    )
    if valid is not None:
        valid = _cap_groups(
            *valid, int(getattr(cfg, "max_valid_groups", 0) or 0), "valid"
        )
    edges = compute_bin_edges(feats, cfg.n_bins, seed=cfg.seed)
    # bin on host and ship uint8: the tunneled host->device link is the
    # bottleneck of the whole training path (measured 491 MB of padded f32
    # features = ~58 s/model vs ~22 s of actual boosting); uint8 bins are
    # 4x smaller and binning via searchsorted costs <1 s
    bins_flat = bin_features(feats, edges)
    fg, lg, mg = _group_pad(bins_flat, labels, group_sessions, cfg.max_group)
    NG, G, F = fg.shape
    # grouped-flat rows; pad group count so the lambda chunk loop tiles
    # exactly (and splits evenly across mesh shards when data-parallel)
    ng_mult = cfg.group_chunk * (mesh.shape[mesh_axis] if mesh is not None else 1)
    fg = _pad_axis0(fg, ng_mult)
    lg = _pad_axis0(lg, ng_mult)
    mg = _pad_axis0(mg, ng_mult)
    bins = jnp.asarray(fg.reshape(-1, F))

    # boosting in trees_per_dispatch chunks: scores carry across dispatches
    # so each device execution stays under remote-runtime deadlines; tree
    # ids stay global so per-tree rng (colsample/bagging) is unchanged and
    # the chunked run is bit-identical to the fused one
    lg_d, mg_d = jnp.asarray(lg), jnp.asarray(mg)
    chunk = max(1, int(getattr(cfg, "trees_per_dispatch", cfg.n_trees)))

    # periodic valid ndcg (reference logs eval every 25 iterations,
    # config.py:223-227) rides the dispatch-chunk boundaries: with a valid
    # set and eval_every > 0, chunks shrink to land on eval points. Valid
    # scores ACCUMULATE across chunks (one [Mv]-score program per chunk's
    # new trees) — per-eval full re-prediction would be quadratic in trees.
    eval_every = int(getattr(cfg, "eval_every", 0) or 0)
    es_rounds = int(getattr(cfg, "early_stopping_rounds", 0) or 0)
    vbins = vlg_d = vmg_d = None
    vscores_acc = None
    if valid is not None:
        vf, vl, vs = valid
        vfg, vlg, vmg = _group_pad(
            bin_features(np.asarray(vf, np.float32), edges), vl, vs,
            cfg.max_group,
        )
        vbins = jnp.asarray(vfg.reshape(-1, F))
        vlg_d, vmg_d = jnp.asarray(vlg), jnp.asarray(vmg)
        vscores_acc = jnp.zeros(vbins.shape[0], jnp.float32)
        if eval_every > 0:
            chunk = max(1, min(chunk, eval_every))
            if eval_every % chunk != 0:  # land dispatches on eval points
                chunk = int(np.gcd(chunk, eval_every))

    scores = jnp.zeros(bins.shape[0], jnp.float32)  # explicit zeros: ONE program
    parts = []
    evals = []          # (n_trees_so_far, valid ndcg@k)
    best_iter, best_score = -1, -np.inf
    n_done = 0
    for t0 in range(0, cfg.n_trees, chunk):
        tids = jnp.arange(t0, min(t0 + chunk, cfg.n_trees))
        if mesh is not None:
            gf, th, gn, lf, scores = _train_program_dp(
                bins, lg_d, mg_d, cfg, mesh, mesh_axis,
                scores0=scores, tree_ids=tids,
            )
        else:
            gf, th, gn, lf, scores = _train_program(
                bins, lg_d, mg_d, cfg, scores0=scores, tree_ids=tids
            )
        parts.append((gf, th, gn, lf))
        n_done = int(tids[-1]) + 1
        at_eval = valid is not None and (
            (eval_every > 0 and (n_done % eval_every == 0 or n_done == cfg.n_trees))
            or (eval_every <= 0 and n_done == cfg.n_trees)
        )
        if at_eval:
            vscores_acc = vscores_acc + _predict_binned_program(
                vbins, gf, th, lf, cfg.n_bins
            )
            ndcg = float(ndcg_at_k(
                vscores_acc.reshape(vlg_d.shape), vlg_d, vmg_d, cfg.ndcg_at
            ))
            evals.append((n_done, ndcg))
            log.info("gbdt [%d] valid ndcg@%d=%.5f", n_done, cfg.ndcg_at, ndcg)
            if ndcg > best_score:
                best_iter, best_score = n_done, ndcg
            elif es_rounds > 0 and n_done - best_iter >= es_rounds:
                log.info(
                    "gbdt early stop at %d trees (best iter %d, ndcg@%d=%.5f)",
                    n_done, best_iter, cfg.ndcg_at, best_score,
                )
                break
        elif valid is not None:
            # keep valid scores current so the next eval point only adds
            # this chunk's trees
            vscores_acc = vscores_acc + _predict_binned_program(
                vbins, gf, th, lf, cfg.n_bins
            )
    gfeat = np.asarray(jnp.concatenate([p[0] for p in parts]))
    thr = np.asarray(jnp.concatenate([p[1] for p in parts]))
    gains = np.asarray(jnp.concatenate([p[2] for p in parts]))
    leaf = np.asarray(jnp.concatenate([p[3] for p in parts]))
    if best_iter < 0:
        best_iter = n_done  # no valid set: reference falls back to
        #                     n_estimators (utils.py:89-93)
    elif es_rounds > 0 and best_iter < len(leaf):
        # keep the best-iteration model (LightGBM early-stopping semantics)
        gfeat, thr = gfeat[:best_iter], thr[:best_iter]
        gains, leaf = gains[:best_iter], leaf[:best_iter]
    model = GBDTRanker(
        cfg=cfg,
        edges=edges,
        gfeat=gfeat,
        thr=thr,
        leaf=leaf,
        gains=gains,
        feature_names=tuple(feature_names),
        best_iter=best_iter,
        best_score=float(best_score) if np.isfinite(best_score) else float("nan"),
    )
    model.eval_history = evals
    return model
