"""Solver-kind dispatch (Models.jl mul_by_M): CG vs BiCGStab vs GMRES paths
must agree on M⁻¹·b and (MᵀM)⁻¹·b, with and without KPM preconditioning."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from elphdynamics_tpu.dynamics.solve import (
    SolverConfig, resolve_precond, solve_minv, solve_oinv,
)
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.ops import kpm


def make_model():
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 3)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.5, mu=-0.25,
    )
    ops = make_model_ops(spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.2 * rng.standard_normal((spec.Nph, spec.Ltau)))
    b = jnp.asarray(rng.standard_normal((2, spec.Nsites, spec.Ltau)))
    return ops, params, x, b


def test_solver_kinds_agree_minv():
    """Unpreconditioned BiCGStab/GMRES stagnate on the bare fermion matrix
    (so does scipy's) — exactly the situation the Left/Right KPM
    preconditioner exists for, so the non-CG kinds run preconditioned."""
    ops, params, x, b = make_model()
    derived = ops.derived(params, x)
    precond = kpm.make_precond(ops, kpm.KPMConfig(max_order=48, c1=4.0, c2=4.0))
    pa = resolve_precond(precond, params, x)
    results = {}
    for kind in ("cg", "bicgstab", "gmres"):
        scfg = SolverConfig(tol=1e-9, maxiter=2000, kind=kind, restart=30)
        res = solve_minv(ops, params, derived, b, scfg,
                         None if kind == "cg" else pa)
        assert np.all(np.asarray(res.flag) == 0), (kind, np.asarray(res.residual))
        # verify M·x = b directly
        got = np.asarray(ops.mulM(params, derived, res.x))
        assert np.allclose(got, np.asarray(b), atol=1e-5), kind
        results[kind] = np.asarray(res.x)
    assert np.allclose(results["cg"], results["bicgstab"], atol=1e-5)
    assert np.allclose(results["cg"], results["gmres"], atol=1e-5)


@pytest.mark.slow
def test_solver_kinds_agree_oinv_with_precond():
    ops, params, x, b = make_model()
    derived = ops.derived(params, x)
    precond = kpm.make_precond(ops, kpm.KPMConfig())
    want = None
    for kind in ("cg", "bicgstab"):
        scfg = SolverConfig(tol=1e-9, maxiter=2000, kind=kind)
        pa = resolve_precond(precond, params, x)
        res = solve_oinv(ops, params, derived, b, scfg, pa)
        assert np.all(np.asarray(res.flag) == 0), kind
        got = np.asarray(ops.mulMTM(params, derived, res.x))
        assert np.allclose(got, np.asarray(b), atol=1e-4), kind
        if want is None:
            want = np.asarray(res.x)
        else:
            assert np.allclose(want, np.asarray(res.x), atol=1e-5)
