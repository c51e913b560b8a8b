"""CirculantBand Pallas kernel: static gates + on-TPU equivalence.

The kernel itself (assembly/pallas_band.py) only lowers on a real TPU;
the CPU tier covers the offset decomposition and the eligibility gate,
and the TPU tier (skipped on CPU CI) pins the kernel against the stack
lowering to f32 roundoff.  Measured on v5e (benchmarks/banded_micro.py):
19.7 us vs 49.0 us per 2-plane 65k-row apply, 1.85x the band-traffic
roofline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from navierstokes_tpu.assembly import pallas_band
from navierstokes_tpu.assembly.fastop import CirculantBand


def _torus_offsets(n, W):
    return sorted({(c + j) % n
                   for c in (0, W, 2 * W, n - W, n - 2 * W)
                   for j in (-2, -1, 0, 1, 2)})


def test_residue_grouping_covers_all_offsets():
    offs = _torus_offsets(4096, 128)
    groups = pallas_band._group_by_residue(offs)
    seen = sorted(k for g in groups.values() for k, _ in g)
    assert seen == list(range(len(offs)))
    for r, entries in groups.items():
        for k, q in entries:
            assert offs[k] == 128 * q + r


def test_eligibility_gate():
    offs = tuple(_torus_offsets(4096, 128))
    assert pallas_band.eligible(offs, 4096, jnp.float32, len(offs) * 4096 * 4)
    # f64 band, non-multiple-of-128 length, sub-tile height, huge band
    assert not pallas_band.eligible(offs, 4096, jnp.float64, 1)
    assert not pallas_band.eligible((0, 1), 4100, jnp.float32, 1)
    assert not pallas_band.eligible((0, 1), 512, jnp.float32, 1)
    assert not pallas_band.eligible((0,), 1 << 22, jnp.float32, int(1e9))
    # out-of-range offset
    assert not pallas_band.eligible((-1, 0), 4096, jnp.float32, 1)


def test_auto_mode_falls_back_off_tpu():
    """On the CPU backend the auto mode must run the stack lowering."""
    rng = np.random.default_rng(0)
    n = 1024
    offs = _torus_offsets(n, 128)
    band = rng.standard_normal((len(offs), n)).astype(np.float32)
    cb = CirculantBand(offs, band, np.float32)
    x = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    if jax.default_backend() == "cpu":
        y_auto = np.asarray(cb.apply(x))
        cb.mode = "stack"
        np.testing.assert_array_equal(y_auto, np.asarray(cb.apply(x)))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a real chip")
@pytest.mark.parametrize("n,W,batch", [(1024, 128, 1), (16384, 256, 2)])
def test_pallas_matches_stack_on_tpu(n, W, batch):
    rng = np.random.default_rng(7)
    offs = _torus_offsets(n, W)
    band = rng.standard_normal((len(offs), n)).astype(np.float32)
    cb = CirculantBand(offs, band, np.float32)
    shape = (n,) if batch == 1 else (batch, n)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cb.mode = "stack"
    y_stack = np.asarray(cb.apply(x))
    cb.mode = "pallas"
    y_pal = np.asarray(cb.apply(x))
    rel = np.abs(y_pal - y_stack).max() / np.abs(y_stack).max()
    assert rel < 1e-6, rel


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a real chip")
def test_fused_pcg_matches_host_pcg_on_tpu():
    """The single-kernel PCG reproduces the reference _pcg iteration
    (same guards/ordering) on a real SPD circulant system."""
    from navierstokes_tpu.solvers.planar_step import _pcg

    rng = np.random.default_rng(11)
    n, W = 4096, 128
    offs = sorted({(c + j) % n for c in (0, W, n - W) for j in (-1, 0, 1)})
    # diagonally dominant symmetric band -> SPD
    band = np.full((len(offs), n), -1.0, np.float32)
    band[offs.index(0)] = 2.0 * len(offs)
    cb = CirculantBand(offs, band, np.float32)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x0 = jnp.zeros_like(b)
    invd = 1.0 / cb.diagonal()

    cb.mode = "stack"
    x_ref, res_ref = _pcg(cb.apply, b, x0, 25, inv_diag=invd)
    x_pal, r_pal = pallas_band.circulant_pcg(
        cb.band, cb.offsets, b, x0, invd, jnp.asarray(1.0, b.dtype),
        25, False)
    rel = float(jnp.linalg.norm(x_pal - x_ref)
                / jnp.linalg.norm(x_ref))
    assert rel < 1e-5, rel
    assert abs(float(jnp.linalg.norm(r_pal.reshape(-1))) - float(res_ref)) \
        <= 1e-4 * float(res_ref) + 1e-6
