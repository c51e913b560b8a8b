"""Mixed-precision machinery: host float64 residual + iterative refinement.

SURVEY hard part #5 / VERDICT round-1 item 3: the reference's
||F|| <= 1e-10 contract is float64; TPUs have no fast float64 path.  The
framework's answer is float32 device Krylov + float64 host residual
accumulation (assembly/host_reference.py, StationarySolver.solve_refined).
"""

import numpy as np

import jax.numpy as jnp

from navierstokes_tpu.assembly.host_reference import residual_f64
from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver


def _cavity(n, Re, **kw):
    mesh, markers = hyper_cube(2, n)
    s = StationarySolver(mesh, markers, **kw)
    s.set_boundary_conditions(
        ((VelocityBCType.no_slip, M.left.value, None),
         (VelocityBCType.no_slip, M.right.value, None),
         (VelocityBCType.no_slip, M.bottom.value, None),
         (VelocityBCType.constant, M.top.value, (1.0, 0.0))))
    s.set_equation_coefficients(
        {"convective_term": 1.0, "viscous_term": 1.0 / Re,
         "pressure_term": 1.0, "coriolis_term": None, "euler_term": None,
         "body_force_term": None})
    return s


def test_host_residual_matches_device_kernels():
    """Same math, independent code path: NumPy f64 assembly agrees with
    the jitted device residual to roundoff (all convective forms)."""
    for form in ("standard", "rotational", "divergence", "skew_symmetric"):
        s = _cavity(8, 50.0, form_convective_term=form)
        s._setup_problem()
        op = s.operator
        scalars = s._scalars()
        bcv = s._bc_values()
        rng = np.random.default_rng(7)
        x = rng.standard_normal(s.space.n_dofs)
        r_dev = np.asarray(op.residual(jnp.asarray(x), bcv, scalars,
                                       0.0, None))
        r_host = residual_f64(s.space, x, s._bc_dofs_all,
                              np.asarray(bcv), scalars,
                              form_convective_term=form)
        err = np.abs(r_dev - r_host).max()
        assert err < 1e-12, (form, err)


def test_solve_refined_reaches_f64_contract():
    """solve() to device precision, then refinement to ||F||_f64 <= 1e-10;
    monitor records the refinement trajectory."""
    s = _cavity(10, 100.0, linear_solver="pcd")
    x = s.solve_refined(tol=1e-10, maxiter=25)
    scalars = s._scalars()
    r = residual_f64(s.space, x, s._bc_dofs_all,
                     np.asarray(s._bc_values()), scalars)
    assert np.linalg.norm(r) <= 1e-10
    recs = [r_ for r_ in s.monitor.records
            if r_["kind"] == "mixed_precision_refinement"]
    assert recs and recs[-1]["residual"] <= 1e-10


def test_refinement_in_true_f32_process():
    """The full mixed-precision path under float32 device numerics.

    Runs in a subprocess WITHOUT x64 (the in-suite tests run f64, where
    refinement is trivially exact).  Guards the round-2 fix chain: the
    unpinned mean-free formulation (a pinned pressure dof parks f32
    round-off in an O(N)-ill-conditioned direction and refinement stalls
    with lres = 0.9999) and the normalized correction solves.
    """
    import subprocess
    import sys

    code = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from navierstokes_tpu.fem.bcs import VelocityBCType
from navierstokes_tpu.mesh import HyperCubeBoundaryMarkers as M
from navierstokes_tpu.mesh import hyper_cube
from navierstokes_tpu.solvers import StationarySolver
from navierstokes_tpu.assembly.host_reference import residual_f64

mesh, markers = hyper_cube(2, 16)
s = StationarySolver(mesh, markers, linear_solver='pcd')
s.set_boundary_conditions(
    ((VelocityBCType.no_slip, M.left.value, None),
     (VelocityBCType.no_slip, M.right.value, None),
     (VelocityBCType.no_slip, M.bottom.value, None),
     (VelocityBCType.constant, M.top.value, (1.0, 0.0))))
s.set_equation_coefficients(
    {'convective_term': 1.0, 'viscous_term': 1.0 / 100.0,
     'pressure_term': 1.0, 'coriolis_term': None, 'euler_term': None,
     'body_force_term': None})
assert s._solution is None
x64 = s.solve_refined(tol=1e-10, maxiter=25)
assert x64.dtype == np.float64
r = residual_f64(s.space, x64, s._bc_dofs_all,
                 np.asarray(s._bc_values(), dtype=np.float64), s._scalars())
rn = float(np.linalg.norm(r))
assert rn <= 1e-10, rn
print('F32-REFINEMENT-OK', rn)
"""
    import os

    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["XLA_FLAGS"] = ""
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert "F32-REFINEMENT-OK" in out.stdout, (out.stdout[-2000:],
                                               out.stderr[-2000:])
