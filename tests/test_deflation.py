"""Unit tests for the incremental slow-mode deflation (ops/deflation.py).

Beyond-reference experimental feature targeting the deep-β CG collapse the
reference shares (KPMPreconditioners.jl:280-318 validity window). Measured
off-by-default-for-a-reason — see BASELINE.md §deep-β: the subspace
rotates with the field faster than the refresh cadence on the real
sampler. The dense ground truth for the method is
scripts/study_deflation_dense.py; these tests pin the mechanics on a
synthetic *static* operator with a controlled spectrum, where the method
provably works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu import solvers
from elphdynamics_tpu.ops import deflation

N, LT = 4, 8  # field shape [N, Lτ]


def _diag_operator(seed=0, n_slow=6):
    """Diagonal SPD operator on the flattened field with a bulk spread over
    [0.85, 1.0] and ``n_slow`` spread-out small outlying eigenvalues — the
    shape of a KPM-preconditioned deep-β spectrum (bulk clustered, broken
    low tail). CG pays ≈1 iteration per distinct outlier, so the deflation
    win scales with ``n_slow``."""
    rng = np.random.default_rng(seed)
    vals = np.concatenate([
        np.geomspace(0.001, 0.05, 8)[:n_slow],
        np.exp(rng.uniform(np.log(0.85), np.log(1.0), N * LT - n_slow)),
    ])
    vals = jnp.asarray(vals.reshape(N, LT), jnp.float32)
    return vals, (lambda v: vals * v)


def test_refresh_converges_to_slow_subspace():
    vals, apply_A = _diag_operator()
    cfg = deflation.DeflationConfig(k=8, filter_degree=6, power_iters=8)
    st = deflation.init(jax.random.PRNGKey(0), cfg.k, N, LT)
    for _ in range(6):
        st = deflation.refresh(st, apply_A, lambda v: v, cfg)
    assert float(st.lam_max) == pytest.approx(1.0, rel=0.05)
    # the six slow coordinate directions must lie in span(W): residual of
    # projecting each slow unit vector onto span(W) ~ 0
    Wf = np.asarray(st.W).reshape(cfg.k, -1)
    order = np.argsort(np.asarray(vals).ravel())
    for idx in order[:6]:
        e = np.zeros(N * LT)
        e[idx] = 1.0
        resid = e - Wf.T @ (Wf @ e)
        assert np.linalg.norm(resid) < 0.05


def test_deflated_cg_fewer_iters_same_solution():
    vals, apply_A = _diag_operator()
    cfg = deflation.DeflationConfig(k=8, filter_degree=6, power_iters=8)
    st = deflation.init(jax.random.PRNGKey(0), cfg.k, N, LT)
    for _ in range(12):
        st = deflation.refresh(st, apply_A, lambda v: v, cfg)

    b = jax.random.normal(jax.random.PRNGKey(3), (2, N, LT))  # batched RHS
    plain = solvers.cg(apply_A, b, tol=1e-6, maxiter=500)
    defl = solvers.cg(apply_A, b, tol=1e-6, maxiter=500, deflate=st)
    x_exact = b / vals
    assert bool(jnp.all(plain.converged)) and bool(jnp.all(defl.converged))
    # a residual tol of 1e-6·|b| permits error ~tol/λmin ≈ 1e-4 in the
    # λ=0.01 slow components — bound both solvers by that, not by machine ε
    np.testing.assert_allclose(np.asarray(defl.x), np.asarray(x_exact),
                               rtol=2e-4, atol=1e-4)
    # slow modes deflated → substantially fewer iterations on every RHS
    assert int(jnp.max(defl.iters)) <= int(jnp.min(plain.iters)) - 5


def test_project_exact_within_span():
    """When W spans the whole error, the init-projection alone solves."""
    vals, apply_A = _diag_operator(n_slow=0)
    # W = 2 arbitrary orthonormal directions; b chosen so x* ∈ span(W)
    q, _ = np.linalg.qr(np.random.default_rng(1).standard_normal((N * LT, 2)))
    W = jnp.asarray(q.T.reshape(2, N, LT), jnp.float32)
    AW = apply_A(W)
    C = np.asarray(jnp.einsum("int,jnt->ij", W, AW))
    st = deflation.DeflationState(
        W=W, chol=jnp.asarray(np.linalg.cholesky(C), jnp.float32),
        pvec=jnp.zeros((N, LT)), lam_max=jnp.asarray(1.0))
    x_true = 1.7 * W[0] + 0.4 * W[1]
    b = apply_A(x_true)
    x0 = deflation.project(st, b, jnp.zeros_like(b))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x_true), atol=1e-5)


@pytest.mark.slow
def test_hmc_with_deflation_runs_and_matches():
    """deflate_k > 0 leaves the physics untouched (solutions are tol-exact
    either way): same acceptance/ΔH as the undeflated step on a small
    Holstein chain, no flags, no NaNs."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=2.0, dtau=0.1, t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.8, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=8))
    x0, _ = init_phonons_half_filled(ops, params, jax.random.PRNGKey(1))

    results = {}
    for dk in (0, 6):
        cfg = HMCConfig(dt=0.1, trajectory_time=0.3, tol=1e-6, maxiter=300,
                        deflate_k=dk)
        step = jax.jit(make_hmc_step(ops, mass, cfg, precond))
        defl = init_deflation(ops, cfg, jax.random.PRNGKey(9))
        st = HMCState(x=x0, v=jnp.zeros_like(x0), defl=defl)
        key = jax.random.PRNGKey(2)
        for _ in range(3):
            st, stats, key = step(params, st, key)
        assert int(stats.flag) == 0
        assert not bool(jnp.any(jnp.isnan(st.x)))
        results[dk] = (float(stats.delta_H), bool(stats.accepted))
    dh0, acc0 = results[0]
    dh6, acc6 = results[6]
    assert acc0 == acc6
    assert dh6 == pytest.approx(dh0, abs=5e-4)


def test_hmc_requires_initialized_state():
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=1.0, dtau=0.1, t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.5, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.2, deflate_k=4)
    step = make_hmc_step(ops, mass, cfg, None)
    x = jnp.zeros((spec.Nsites, spec.Ltau))
    with pytest.raises(ValueError, match="deflate_k"):
        step(params, HMCState(x=x, v=x), jax.random.PRNGKey(0))


# ---- complex-Hermitian path (twisted-BC / Peierls-phase hopping) ----------
#
# M†M is ℂ-linear Hermitian PD, so deflation generalizes by swapping every
# Gram/projection to the Hermitian inner product (conj placements in
# ops/deflation.py). These mirror the real static-operator tests above on a
# dense complex Hermitian operator with the same bulk+slow-tail spectrum.


def _hermitian_operator(seed=0, n_slow=6):
    rng = np.random.default_rng(seed)
    n = N * LT
    vals = np.concatenate([
        np.geomspace(0.001, 0.05, 8)[:n_slow],
        np.exp(rng.uniform(np.log(0.85), np.log(1.0), n - n_slow)),
    ])
    Z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    U, _ = np.linalg.qr(Z)
    A = (U * vals) @ U.conj().T
    A = jnp.asarray(0.5 * (A + A.conj().T), jnp.complex64)
    evecs = U[:, np.argsort(vals)]

    def apply_A(v):
        lead = v.shape[:-2]
        vf = v.reshape(lead + (-1,))
        return jnp.einsum("ij,...j->...i", A, vf).reshape(v.shape)

    return jnp.asarray(vals), evecs, apply_A


def test_refresh_converges_to_slow_subspace_complex():
    vals, evecs, apply_A = _hermitian_operator()
    cfg = deflation.DeflationConfig(k=8, filter_degree=6, power_iters=8)
    st = deflation.init(jax.random.PRNGKey(0), cfg.k, N, LT,
                        dtype=jnp.complex64)
    for _ in range(6):
        st = deflation.refresh(st, apply_A, lambda v: v, cfg)
    assert float(st.lam_max) == pytest.approx(1.0, rel=0.05)
    Wf = np.asarray(st.W).reshape(cfg.k, -1)
    for j in range(6):
        e = evecs[:, j]
        resid = e - Wf.T @ (Wf.conj() @ e)   # Hermitian projection onto span(W)
        assert np.linalg.norm(resid) < 0.05, (j, np.linalg.norm(resid))


def test_deflated_cg_fewer_iters_same_solution_complex():
    vals, evecs, apply_A = _hermitian_operator()
    cfg = deflation.DeflationConfig(k=8, filter_degree=6, power_iters=8)
    st = deflation.init(jax.random.PRNGKey(0), cfg.k, N, LT,
                        dtype=jnp.complex64)
    for _ in range(12):
        st = deflation.refresh(st, apply_A, lambda v: v, cfg)

    kb = jax.random.split(jax.random.PRNGKey(3))
    b = (jax.random.normal(kb[0], (2, N, LT))
         + 1j * jax.random.normal(kb[1], (2, N, LT))).astype(jnp.complex64)
    plain = solvers.cg(apply_A, b, tol=1e-6, maxiter=500)
    defl = solvers.cg(apply_A, b, tol=1e-6, maxiter=500, deflate=st)
    assert bool(jnp.all(plain.converged)) and bool(jnp.all(defl.converged))
    # both converge to the same solution (residual-verified either way)
    np.testing.assert_allclose(np.asarray(defl.x), np.asarray(plain.x),
                               rtol=2e-3, atol=2e-3)
    assert int(jnp.max(defl.iters)) <= int(jnp.min(plain.iters)) - 5


def test_project_exact_within_span_complex():
    _, _, apply_A = _hermitian_operator(n_slow=0)
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.standard_normal((N * LT, 2))
                        + 1j * rng.standard_normal((N * LT, 2)))
    W = jnp.asarray(q.T.reshape(2, N, LT), jnp.complex64)
    AW = apply_A(W)
    C = np.asarray(jnp.einsum("int,jnt->ij", jnp.conj(W), AW))
    st = deflation.DeflationState(
        W=W, chol=jnp.asarray(np.linalg.cholesky(C), jnp.complex64),
        pvec=jnp.zeros((N, LT), jnp.complex64), lam_max=jnp.asarray(1.0))
    x_true = (1.7 - 0.6j) * W[0] + (0.4 + 1.1j) * W[1]
    b = apply_A(x_true)
    x0 = deflation.project(st, b, jnp.zeros_like(b))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x_true), atol=1e-5)


@pytest.mark.slow
def test_hmc_with_deflation_on_twisted_lattice():
    """deflate_k > 0 composes with complex hopping: full HMC updates on a
    twisted Holstein chain run flag-free with a complex basis and leave
    the accept/ΔH stream unchanged vs deflate_k = 0 (projections only
    steer solver starts; every solve is residual-verified)."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=2.0, dtau=0.1, t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.8, mu=0.0, twist=(0.7,))
    assert jnp.iscomplexobj(params.cosht)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=8))
    x0, _ = init_phonons_half_filled(ops, params, jax.random.PRNGKey(1))

    results = {}
    for dk in (0, 6):
        cfg = HMCConfig(dt=0.1, trajectory_time=0.3, tol=1e-6, maxiter=300,
                        deflate_k=dk)
        step = jax.jit(make_hmc_step(ops, mass, cfg, precond))
        defl = init_deflation(ops, cfg, jax.random.PRNGKey(9), params=params)
        if dk:
            assert jnp.iscomplexobj(defl.W)
        st = HMCState(x=x0, v=jnp.zeros_like(x0), defl=defl)
        key = jax.random.PRNGKey(2)
        for _ in range(3):
            st, stats, key = step(params, st, key)
        assert int(stats.flag) == 0
        assert not bool(jnp.any(jnp.isnan(st.x)))
        results[dk] = (float(stats.delta_H), bool(stats.accepted))
    dh0, acc0 = results[0]
    dh6, acc6 = results[6]
    assert acc0 == acc6
    assert dh6 == pytest.approx(dh0, abs=5e-4)


def test_hmc_complex_requires_complex_basis():
    """A real basis with complex hopping is rejected at trace time."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=1.0, dtau=0.1, t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.5, mu=0.0, twist=(0.6,))
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.2, deflate_k=4)
    step = make_hmc_step(ops, mass, cfg, None)
    defl = init_deflation(ops, cfg, jax.random.PRNGKey(0))  # real basis
    x = jnp.zeros((spec.Nsites, spec.Ltau))
    with pytest.raises(ValueError, match="complex deflation basis"):
        step(params, HMCState(x=x, v=x, defl=defl), jax.random.PRNGKey(0))
