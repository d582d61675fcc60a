"""Two-level near-null preconditioner (ops/nearnull.py): structural
correctness against dense linear algebra, and the functional claim —
fewer KPM-CG iterations at deep β with solutions still residual-exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu import solvers
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.models.holstein import build_holstein
from elphdynamics_tpu.ops import kpm
from elphdynamics_tpu.ops.nearnull import (
    NearNullConfig, _build, _chunk_counts, _smooth, apply_correction,
    make_nearnull_precond)


def _model(L=4, beta=8.0, lam=1.0, seed=3):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = build_holstein(
        lat, beta=beta, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=lam, mu=0.0)
    ops = make_model_ops(spec)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(0.5 * rng.standard_normal((spec.Nph, spec.Ltau)))
    return ops, spec, params, x


def _dense_W(ops, nn, cfg):
    """The explicit [NL, D] chopped-orthonormal basis apply_correction
    implies: column (J, i) = Σ_m χ_J T_m · C_J[m, i]."""
    N, Lt = ops.Nsites, ops.Ltau
    c, nt = _chunk_counts(Lt, cfg)
    T = np.asarray(nn.T)
    C = np.asarray(nn.C)
    k = cfg.k
    W = np.zeros((N * Lt, nt * k))
    Tc = T.reshape(k, N, nt, c)
    for J in range(nt):
        for i in range(k):
            col = np.zeros((N, nt, c))
            col[:, J, :] = np.einsum("mns,m->ns", Tc[:, :, J, :], C[J, :, i])
            W[:, J * k + i] = col.reshape(N, Lt).ravel()
    return W


def test_correction_matches_dense_WGW():
    ops, spec, params, x = _model()
    cfg = NearNullConfig(k=4, c=4, setup_iters=5, setup_passes=1)
    derived = ops.derived(params, x)
    kcfg = kpm.KPMConfig(max_order=4)
    kst = kpm.setup(ops, params, x, kcfg, jax.random.PRNGKey(0))
    T = jax.random.normal(jax.random.PRNGKey(1),
                          (cfg.k, ops.Nsites, ops.Ltau), x.dtype)
    T = _smooth(ops, params, derived, kst, kcfg, T, 5)
    nn = _build(ops, params, derived, T, cfg)

    # W columns orthonormal per chunk
    W = _dense_W(ops, nn, cfg)
    WtW = W.T @ W
    # deviations up to ~1e-4 on weak chunks are the intentional reg jitter
    # (S + ε·scale·I with scale the MEAN chunk trace)
    np.testing.assert_allclose(WtW, np.eye(W.shape[1]), atol=5e-4)

    # Ginv really inverts the Galerkin (MW)ᵀ(MW) (up to the jitter)
    NL = ops.Nsites * ops.Ltau
    MW = np.stack([
        np.asarray(ops.mulM(params, derived,
                            jnp.asarray(W[:, j].reshape(ops.Nsites, ops.Ltau)))
                   ).ravel()
        for j in range(W.shape[1])], axis=1)
    G = MW.T @ MW
    np.testing.assert_allclose(np.asarray(nn.Ginv) @ G, np.eye(G.shape[0]),
                               atol=5e-3)

    # apply_correction == W Ginv Wᵀ r
    rng = np.random.default_rng(0)
    r = rng.standard_normal((ops.Nsites, ops.Ltau))
    got = np.asarray(apply_correction(ops, nn, jnp.asarray(r), cfg))
    want = (W @ (np.asarray(nn.Ginv) @ (W.T @ r.ravel()))).reshape(
        ops.Nsites, ops.Ltau)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.slow
def test_two_level_cuts_iterations_and_stays_exact():
    """Deep-ish β Holstein: the two-level preconditioner cuts CG iterations
    vs the KPM preconditioner alone, and the solution still satisfies the
    ORIGINAL system to tolerance (any SPD preconditioner must)."""
    ops, spec, params, x = _model(beta=12.0, lam=1.0)
    derived = ops.derived(params, x)
    kcfg = kpm.KPMConfig(max_order=4)
    ncfg = NearNullConfig(k=8, c=4)
    base = kpm.make_symmetric_precond(ops, kcfg)
    two = make_nearnull_precond(ops, kcfg, ncfg)

    kst = base.setup(params, x)
    tst = two.setup(params, x)

    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((ops.Nsites, ops.Ltau)))
    apply_A = lambda v: ops.mulMTM(params, derived, v)

    r1 = solvers.cg(apply_A, b, apply_P=lambda v: base.symmetric(kst, v),
                    tol=1e-6, maxiter=3000)
    r2 = solvers.cg(apply_A, b, apply_P=lambda v: two.symmetric(tst, v),
                    tol=1e-6, maxiter=3000)
    nb = float(jnp.linalg.norm(b))
    res2 = float(jnp.linalg.norm(apply_A(r2.x) - b)) / nb
    assert res2 < 5e-6, res2
    assert int(r2.iters) < int(r1.iters), (int(r2.iters), int(r1.iters))
    # refresh path keeps working and stays SPD-convergent
    tst2 = two.refresh(tst, params, x)
    r3 = solvers.cg(apply_A, b, apply_P=lambda v: two.symmetric(tst2, v),
                    tol=1e-6, maxiter=3000)
    res3 = float(jnp.linalg.norm(apply_A(r3.x) - b)) / nb
    assert res3 < 5e-6 and int(r3.iters) <= int(r1.iters)
