import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu import solvers
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.ops import kpm
from elphdynamics_tpu.ops.timefreqfft import omega_to_tau, tau_to_omega
from dense_reference import dense_expK, dense_M


def make_model(L=4, beta=2.0, lam=0.6, seed=0, x_scale=0.3):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=beta, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=lam, mu=-lam ** 2,
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(x_scale * rng.standard_normal((spec.Nph, spec.Ltau)))
    return make_model_ops(spec), params, x


def test_tau_omega_roundtrip():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((5, 7, 12)))
    w = tau_to_omega(v)
    back = omega_to_tau(w)
    assert np.allclose(back, v, atol=1e-12)


def test_kpm_exact_for_time_independent_field():
    """With x ≡ 0 the averaged operator Ā equals every B(τ), so the KPM
    block-diagonal inverse is exact: apply_left ≈ M⁻¹ at high order."""
    ops, params, _ = make_model(x_scale=0.0)
    x = jnp.zeros((ops.Nph, ops.Ltau))
    st = kpm.setup(ops, params, x, kpm.KPMConfig(max_order=96, c1=8.0, c2=8.0),
                   jax.random.PRNGKey(0))
    assert bool(st.active)
    env = H.expnV(ops.spec, params, x)
    expK = dense_expK(ops.Nsites, ops.spec.ckb.neighbor_table, ops.spec.ckb.groups,
                      np.asarray(params.cosht), np.asarray(params.sinht))
    M = dense_M([expK @ np.diag(np.asarray(env)[:, t]) for t in range(ops.Ltau)])
    rng = np.random.default_rng(1)
    v = rng.standard_normal((ops.Nsites, ops.Ltau))
    got = np.asarray(kpm.apply_left(ops, st, jnp.asarray(v))).reshape(-1)
    want = np.linalg.solve(M, v.reshape(-1))
    assert np.max(np.abs(got - want)) < 1e-4, np.max(np.abs(got - want))


def test_kpm_symmetric_reduces_cg_iterations():
    ops, params, x = make_model()
    env = ops.derived(params, x)
    st = kpm.setup(ops, params, x, kpm.KPMConfig(), jax.random.PRNGKey(0))
    assert bool(st.active)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((ops.Nsites, ops.Ltau)))
    rhs = ops.mulMT(params, env, b)
    A = lambda v: ops.mulMTM(params, env, v)
    plain = solvers.cg(A, rhs, tol=1e-8, maxiter=4000)
    pre = solvers.cg(A, rhs, apply_P=lambda v: kpm.apply_symmetric(ops, st, v),
                     tol=1e-8, maxiter=4000)
    # solutions agree
    assert np.allclose(np.asarray(plain.x), np.asarray(pre.x), atol=1e-4)
    # and the preconditioner meaningfully cuts iterations
    assert int(pre.iters) < int(plain.iters), (int(pre.iters), int(plain.iters))
    assert int(pre.iters) <= int(plain.iters) * 0.7, (int(pre.iters), int(plain.iters))


def test_kpm_spin_batched():
    ops, params, x = make_model()
    st = kpm.setup(ops, params, x, kpm.KPMConfig(), jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((2, ops.Nsites, ops.Ltau)))
    out = np.asarray(kpm.apply_symmetric(ops, st, v))
    for s in range(2):
        ref = np.asarray(kpm.apply_symmetric(ops, st, v[s]))
        assert np.allclose(out[s], ref, atol=1e-12)


@pytest.mark.slow
def test_exact_lowfreq_blocks_match_dense_inverse():
    """KPMConfig.exact_lowfreq (beyond-reference hybrid): with ALL
    frequencies exact and a τ-constant field, the symmetric apply IS
    (MᵀM)⁻¹ — validated against the dense inverse. With only the lowest k
    exact, CG must converge in (far) fewer iterations than pure Chebyshev
    at the same order on an ill-conditioned long-τ problem."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig, solve_oinv

    ops, params, _ = make_model(L=4, beta=3.0, x_scale=0.0)
    x = jnp.zeros((ops.Nph, ops.Ltau))
    Lw = (ops.Ltau + 1) // 2

    # all frequencies exact → exact inverse for a τ-constant field
    st = kpm.setup(ops, params, x,
                   kpm.KPMConfig(max_order=8, exact_lowfreq=Lw),
                   jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((ops.Nsites, ops.Ltau)))
    got = np.asarray(kpm.apply_symmetric(ops, st, v))

    env = ops.derived(params, x)
    NL = ops.Nsites * ops.Ltau
    eye = np.eye(NL)
    cols = ops.mulMT(params, env, ops.mulM(
        params, env, jnp.asarray(eye.reshape(NL, ops.Nsites, ops.Ltau))))
    MtM = np.asarray(cols).reshape(NL, NL).T
    want = np.linalg.solve(MtM, np.asarray(v).reshape(-1)).reshape(v.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    # partial: k lowest exact beats pure Chebyshev on a long-τ problem
    ops2, params2, x2 = make_model(L=4, beta=6.0, lam=1.0, x_scale=0.3)
    scfg = SolverConfig(tol=1e-6, maxiter=1000)
    b = jnp.asarray(rng.standard_normal((2, ops2.Nsites, ops2.Ltau)))

    def iters_with(cfg):
        stp = kpm.setup(ops2, params2, x2, cfg, jax.random.PRNGKey(1))
        from elphdynamics_tpu.dynamics import solve as S
        env2 = ops2.derived(params2, x2)
        res = solve_oinv(ops2, params2, env2, b, scfg,
                         S.PrecondApplies(
                             symmetric=lambda w: kpm.apply_symmetric(
                                 ops2, stp, w, cfg),
                             left=None, right=None))
        return int(np.max(np.asarray(res.iters))), int(np.max(np.asarray(res.flag)))

    it_plain, fl1 = iters_with(kpm.KPMConfig(max_order=6))
    it_hyb, fl2 = iters_with(kpm.KPMConfig(max_order=6, exact_lowfreq=8))
    assert fl1 == 0 and fl2 == 0
    assert it_hyb < it_plain, (it_hyb, it_plain)
