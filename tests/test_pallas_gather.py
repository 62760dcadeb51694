"""gather_rows Pallas kernel (interpret mode) vs take_along_axis oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from otto_tpu.ops.pallas.gather import gather_rows


@pytest.mark.parametrize("dtype", [np.int32, np.float32])
def test_gather_rows(dtype):
    rng = np.random.default_rng(7)
    B, S, P = 3, 9, 300  # odd S, non-128-multiple P
    if np.issubdtype(dtype, np.floating):
        vals = rng.normal(size=(B, S, P)).astype(dtype)
    else:
        vals = rng.integers(-100, 100, (B, S, P)).astype(dtype)
    idx = np.stack([rng.permutation(P) for _ in range(S)]).astype(np.int32)
    want = np.take_along_axis(vals, idx[None], axis=2)
    got = gather_rows(jnp.asarray(vals), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_gather_rows_repeated_indices():
    rng = np.random.default_rng(8)
    B, S, P = 2, 8, 256
    vals = rng.integers(0, 100, (B, S, P)).astype(np.int32)
    idx = rng.integers(0, P, (S, P)).astype(np.int32)  # not a permutation
    want = np.take_along_axis(vals, idx[None], axis=2)
    got = gather_rows(jnp.asarray(vals), jnp.asarray(idx), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_transport_sort_pallas_route(monkeypatch):
    """rowwise_transport_sort must be identical via XLA or Pallas gathers."""
    from otto_tpu.ops import segment as seg

    rng = np.random.default_rng(9)
    S, C = 4, 600
    key = jnp.asarray(rng.integers(0, 40, (S, C)).astype(np.int32))
    arrays = [
        jnp.asarray(rng.integers(0, 100, (S, C)).astype(np.int32)),
        jnp.asarray(rng.normal(size=(S, C)).astype(np.float32)),
    ]
    monkeypatch.setenv("OTTO_PALLAS_GATHER", "off")
    ks0, out0 = seg.rowwise_transport_sort(key, arrays)
    monkeypatch.setenv("OTTO_PALLAS_GATHER", "interpret")
    ks1, out1 = seg.rowwise_transport_sort(key, arrays)
    np.testing.assert_array_equal(np.asarray(ks0), np.asarray(ks1))
    for a, b in zip(out0, out1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
