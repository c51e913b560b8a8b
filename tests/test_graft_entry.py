"""Driver entry points: single-chip step and the 8-device sharded dryrun."""

import pytest

import jax
import jax.numpy as jnp


def test_entry_step_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    state = fn(*args)
    # spectral state: (U, U_old, Uh, Uh_old, Ph); U physical class grids
    u = state[0]
    assert u.shape == args[0].shape
    assert bool(jnp.all(jnp.isfinite(u)))
    for leaf in jax.tree_util.tree_leaves(state):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # jit-compilability of the entry step (what the driver checks)
    state2 = jax.jit(fn)(*args)
    assert jnp.allclose(state2[0], u)


@pytest.mark.slow
def test_dryrun_multichip_eight_devices():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
