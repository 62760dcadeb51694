"""segmented_scan_pallas (interpret mode) vs the XLA Hillis-Steele oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from otto_tpu.ops import segment as seg
from otto_tpu.ops.pallas.segscan import segmented_scan_pallas


def _case(rng, B, S, P, dtype, red):
    if np.issubdtype(dtype, np.floating):
        vals = rng.normal(size=(B, S, P)).astype(dtype)
    else:
        vals = rng.integers(-50, 50, (B, S, P)).astype(dtype)
    first = rng.random((S, P)) < 0.15
    first[:, 0] = True
    return jnp.asarray(vals), jnp.asarray(first)


@pytest.mark.parametrize("red", ["sum", "min", "max"])
@pytest.mark.parametrize("dtype", [np.int32, np.float32])
def test_matches_xla_scan(red, dtype):
    rng = np.random.default_rng(3)
    vals, first = _case(rng, 3, 9, 300, dtype, red)  # odd S, non-128 P
    want = seg.segmented_scan(
        (vals,), (red,), jnp.broadcast_to(first, vals.shape), axis=2
    )[0]
    got = segmented_scan_pallas(vals, first, red, interpret=True)
    if red == "sum" and np.issubdtype(dtype, np.floating):
        # float sums: the two scans reduce in different association orders
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
    else:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multi_chunk_carry():
    """Segments spanning several 128-lane chunks exercise the carry path."""
    rng = np.random.default_rng(5)
    B, S, P = 2, 8, 640
    vals = jnp.asarray(rng.integers(0, 10, (B, S, P)).astype(np.int32))
    # one flag per row at a random position -> giant segments across chunks
    first = np.zeros((S, P), bool)
    first[:, 0] = True
    for s in range(S):
        first[s, rng.integers(1, P)] = True
    firstj = jnp.asarray(first)
    want = seg.segmented_scan(
        (vals,), ("sum",), jnp.broadcast_to(firstj, vals.shape), axis=2
    )[0]
    got = segmented_scan_pallas(vals, firstj, "sum", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rowwise_groupby_scan_layout():
    """rowwise_groupby_scan's segment-end values must equal the compacted
    rowwise_groupby reductions (same groups, different layout)."""
    rng = np.random.default_rng(11)
    S, C = 4, 600
    key = jnp.asarray(rng.integers(0, 40, (S, C)).astype(np.int32))
    cols = {
        "a": (jnp.asarray(rng.integers(0, 100, (S, C)).astype(np.int32)), "sum"),
        "b": (jnp.asarray(rng.integers(0, 100, (S, C)).astype(np.int32)), "min"),
        "c": (jnp.asarray(rng.normal(size=(S, C)).astype(np.float32)), "max"),
    }
    uk, out, n = seg.rowwise_groupby(key, cols)
    ks, scanned, is_end, n2 = seg.rowwise_groupby_scan(key, cols)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n2))
    ksn = np.asarray(ks); endn = np.asarray(is_end)
    ukn = np.asarray(uk)
    for s in range(S):
        ends = np.nonzero(endn[s])[0]
        np.testing.assert_array_equal(ksn[s, ends], ukn[s, : len(ends)])
        for name in cols:
            vals = np.asarray(scanned[name])[s, ends]
            np.testing.assert_allclose(
                vals, np.asarray(out[name])[s, : len(ends)], rtol=1e-6
            )
