"""The driver's integration surface: entry() must stay jittable and the
multichip dryrun must keep compiling over a virtual mesh."""
import jax
import pytest


def test_entry_jittable():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    # GBDT scorer: [M, F] features -> [M] scores
    assert out.shape == (args[0].shape[0],)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_smoke():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile regression
