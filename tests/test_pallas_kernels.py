"""Pallas element-apply kernel: parity with the XLA einsum path."""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.assembly.pallas_kernels import element_apply


def test_element_apply_matches_einsum():
    rng = np.random.default_rng(11)
    for nc, nn, d in [(100, 6, 2), (513, 3, 1), (64, 10, 3)]:
        A = jnp.asarray(rng.standard_normal((nc, nn, nn)))
        u = jnp.asarray(rng.standard_normal((nc, nn, d)))
        ref = jnp.einsum("cij,cjd->cid", A, u)
        out = element_apply(A, u, interpret=True)
        assert np.allclose(out, ref, atol=1e-12), (nc, nn, d)
