"""Pallas fused MIPS/L2 top-k kernel vs brute-force oracle (interpret mode
on CPU; the compiled path runs on TPU in bench)."""
import numpy as np
import jax.numpy as jnp
import pytest

from otto_tpu.ops.pallas.mips import mips_topk_pallas

RNG = np.random.default_rng(0)


def brute_topk(q, c, k, metric):
    if metric == "l2":
        s = -(((q[:, None, :] - c[None, :, :]) ** 2).sum(-1))
    else:
        s = q @ c.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, 1), idx


@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_pallas_mips_matches_bruteforce(metric):
    Q, V, D, k = 8, 300, 16, 5
    q = RNG.normal(size=(Q, D)).astype(np.float32)
    c = RNG.normal(size=(V, D)).astype(np.float32)
    s, i = mips_topk_pallas(
        jnp.asarray(q), jnp.asarray(c), k, metric, bq=8, bv=128, interpret=True
    )
    ws, wi = brute_topk(q, c, k, metric)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)
    # indices can differ only on exact score ties
    ties = np.isclose(np.asarray(s), ws, rtol=1e-4)
    assert np.all((np.asarray(i) == wi) | ties)


def test_pallas_mips_self_nearest():
    V, D, k = 200, 8, 3
    c = RNG.normal(size=(V, D)).astype(np.float32)
    s, i = mips_topk_pallas(
        jnp.asarray(c[:16]), jnp.asarray(c), k, "l2", bq=16, bv=64,
        interpret=True,
    )
    assert np.asarray(i)[:, 0].tolist() == list(range(16))
    np.testing.assert_allclose(np.asarray(s)[:, 0], 0.0, atol=1e-3)


def test_pallas_mips_padding():
    """V not divisible by bv: padded corpus rows must never appear."""
    Q, V, D, k = 4, 100, 8, 4
    q = RNG.normal(size=(Q, D)).astype(np.float32)
    c = (RNG.normal(size=(V, D)) + 5.0).astype(np.float32)  # far from origin
    s, i = mips_topk_pallas(
        jnp.asarray(q), jnp.asarray(c), k, "l2", bq=4, bv=64, interpret=True
    )
    assert np.asarray(i).max() < V
    assert np.asarray(i).min() >= 0
