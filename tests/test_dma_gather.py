"""DMA row-gather kernel vs numpy oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from otto_tpu.ops.pallas.dma_gather import gather_rows_hbm


def test_dma_gather_matches_numpy():
    rng = np.random.default_rng(0)
    V, D, N = 1000, 128, 300  # N not a block multiple: exercises padding
    tab = rng.normal(size=(V, D)).astype(np.float32)
    ids = rng.integers(0, V, N).astype(np.int32)
    out = gather_rows_hbm(jnp.asarray(tab), jnp.asarray(ids), 64, True)
    np.testing.assert_allclose(np.asarray(out), tab[ids])


def test_dma_gather_int_table():
    rng = np.random.default_rng(1)
    tab = rng.integers(-5, 5, (256, 128)).astype(np.int32)
    ids = rng.integers(0, 256, 128).astype(np.int32)
    out = gather_rows_hbm(jnp.asarray(tab), jnp.asarray(ids), 32, True)
    np.testing.assert_array_equal(np.asarray(out), tab[ids])
