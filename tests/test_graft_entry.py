"""Driver entry points: single-chip step and the 8-device sharded dryrun."""

import jax
import jax.numpy as jnp


def test_entry_step_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    u, p, phi = fn(*args)
    assert u.shape == args[0].shape
    assert p.shape == args[2].shape
    assert bool(jnp.all(jnp.isfinite(u)))


def test_dryrun_multichip_eight_devices():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
