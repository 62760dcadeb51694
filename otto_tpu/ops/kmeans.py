"""KMeans (Lloyd's) as device matmul + argmin + segment-sum (C11).

Replaces dask_ml / sklearn KMeans over chunked HDF5 arrays (reference:
model/kmeans_sessions.py:119-161, k=50, max_iter=100, tol=1e-3, seed=42).
One Lloyd iteration is a single jitted program: distance = matmul on the MXU,
assignment = argmin, centroid update = scatter-add — data-parallel over
session shards with a psum when run under shard_map.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KMeansState(NamedTuple):
    centroids: jnp.ndarray  # [K, D]
    inertia: jnp.ndarray    # []
    n_iter: jnp.ndarray     # []


@partial(jax.jit, static_argnums=())
def assign(x: jnp.ndarray, centroids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(labels [N], sq-distances to the chosen centroid [N])."""
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)
    c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
    d = x_sq + c_sq - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    return labels, jnp.maximum(best, 0.0)


@jax.jit
def lloyd_step(x: jnp.ndarray, centroids: jnp.ndarray):
    """One Lloyd iteration. Empty clusters keep their previous centroid
    (sklearn re-seeds; at k=50 over millions of points empties are rare)."""
    K = centroids.shape[0]
    labels, dists = assign(x, centroids)
    sums = jnp.zeros_like(centroids).at[labels].add(x)
    cnts = jnp.zeros((K,), jnp.float32).at[labels].add(1.0)
    new = jnp.where(
        cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1.0), centroids
    )
    inertia = jnp.sum(dists)
    shift = jnp.sum((new - centroids) ** 2)
    return new, inertia, shift


def _kmeanspp_init(xd: jnp.ndarray, k: int, rng: np.random.Generator) -> jnp.ndarray:
    """k-means++ seeding: each next centre sampled proportional to squared
    distance from the chosen set (distance updates run on device)."""
    n = xd.shape[0]
    first = int(rng.integers(0, n))
    centers = [xd[first]]
    d2 = jnp.sum((xd - centers[0][None, :]) ** 2, axis=1)
    for _ in range(1, k):
        p = np.asarray(d2, np.float64)
        p = np.maximum(p, 0)
        tot = p.sum()
        if tot <= 0:
            idx = int(rng.integers(0, n))
        else:
            idx = int(rng.choice(n, p=p / tot))
        c = xd[idx]
        centers.append(c)
        d2 = jnp.minimum(d2, jnp.sum((xd - c[None, :]) ** 2, axis=1))
    return jnp.stack(centers)


def kmeans_fit(
    x: np.ndarray,
    n_clusters: int,
    max_iter: int = 100,
    tol: float = 1e-3,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray, float, int]:
    """Fit KMeans; returns (centroids, labels, inertia, n_iter).

    Init: k-means++ (D^2 sampling — dask_ml's k-means|| analogue, reference:
    model/kmeans_sessions.py:144-150). tol semantics follow sklearn: stop
    when the squared Frobenius norm of the centroid shift drops below
    tol * mean per-feature variance.
    """
    rng = np.random.default_rng(seed)
    xd = jnp.asarray(x, jnp.float32)
    centroids = _kmeanspp_init(xd, n_clusters, rng)
    thresh = tol * float(np.mean(np.var(x, axis=0)))

    inertia = np.inf
    it = 0
    for it in range(1, max_iter + 1):
        centroids, inertia_j, shift = lloyd_step(xd, centroids)
        inertia = float(inertia_j)
        if float(shift) <= thresh:
            break
    labels, _ = assign(xd, centroids)
    return np.asarray(centroids), np.asarray(labels), inertia, it
