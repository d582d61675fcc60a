import pytest
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu import solvers
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H


def spd_problem(n=24, batch=(), seed=0, cond=50.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.linspace(1.0, cond, n)
    A = Q @ np.diag(eigs) @ Q.T
    b = rng.standard_normal(batch + (n, 1))
    return jnp.asarray(A), jnp.asarray(b)


def test_cg_dense_spd():
    A, b = spd_problem()
    res = solvers.cg(lambda v: A @ v, b, tol=1e-10, maxiter=500)
    x = np.asarray(res.x)
    assert np.allclose(A @ x, b, atol=1e-7)
    assert bool(res.converged)


def test_cg_batched_masked_iteration_counts():
    A, b = spd_problem(batch=(4,))
    res = solvers.cg(lambda v: A @ v, b, tol=1e-10, maxiter=500)
    assert res.x.shape == b.shape
    for i in range(4):
        assert np.allclose(A @ np.asarray(res.x[i]), b[i], atol=1e-7)
    assert np.all(np.asarray(res.converged))


def test_cg_preconditioned_fewer_iters():
    A, b = spd_problem(cond=500.0)
    dinv = 1.0 / jnp.diag(A)[:, None]
    plain = solvers.cg(lambda v: A @ v, b, tol=1e-10, maxiter=1000)
    pre = solvers.cg(lambda v: A @ v, b, apply_P=lambda v: dinv * v, tol=1e-10, maxiter=1000)
    assert np.allclose(np.asarray(pre.x), np.asarray(plain.x), atol=1e-6)
    assert int(pre.iters) <= int(plain.iters) + 2


def test_cg_unrolled_matches_reference():
    """unroll>1 runs masked extra iterations — solutions must agree."""
    A, b = spd_problem(batch=(4,), cond=200.0)
    ref = solvers.cg(lambda v: A @ v, b, tol=1e-10, maxiter=500)
    for n in (2, 3):
        res = solvers.cg(lambda v: A @ v, b, tol=1e-10, maxiter=500, unroll=n)
        assert np.allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-6)
        assert np.all(np.asarray(res.converged))
        # masked tail iterations never count: per-element iters identical
        assert np.array_equal(np.asarray(res.iters), np.asarray(ref.iters))


def test_solve_checked_flags_ok():
    A, b = spd_problem()
    res = solvers.solve_checked(lambda v: A @ v, b, apply_P=lambda v: v, tol=1e-8, maxiter=500)
    assert int(res.flag) == 0
    assert float(res.residual) < 1e-4


def test_solve_checked_fallback_recovers():
    """A bad preconditioner triggers the retry-without-preconditioner path."""
    A, b = spd_problem(cond=100.0)
    rng = np.random.default_rng(5)
    bad = jnp.asarray(rng.standard_normal((24, 24)))

    res = solvers.solve_checked(
        lambda v: A @ v, b, apply_P=lambda v: bad @ v, tol=1e-8, maxiter=30,
    )
    # fallback must produce an accurate solution regardless
    assert np.allclose(A @ np.asarray(res.x), b, atol=1e-3)


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(2)
    n = 24
    A = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal((n, 1))
    res = solvers.bicgstab(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10, maxiter=200)
    assert np.allclose(A @ np.asarray(res.x), b, atol=1e-6)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 24
    A = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal((n, 1))
    res = solvers.gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10, maxiter=200, restart=10)
    assert np.allclose(A @ np.asarray(res.x), b, atol=1e-6)


def test_cg_on_MTM_fermion_system():
    """Solve MᵀM x = Mᵀ b on a real Holstein operator and verify M x ≈ b."""
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 3)
    spec, params = H.build_holstein(
        lat, beta=0.4, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.5,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(0.2 * rng.standard_normal((spec.Nph, spec.Ltau)))
    env = H.expnV(spec, params, x)
    b = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    rhs = H.mulMT(spec, params, env, b)
    res = solvers.cg(lambda v: H.mulMTM(spec, params, env, v), rhs, tol=1e-10, maxiter=2000)
    got = np.asarray(H.mulM(spec, params, env, res.x))
    assert np.allclose(got, np.asarray(b), atol=1e-6)


def test_cg_split_preconditioner():
    """Split L/Lᵀ CG (IterativeSolvers.jl:64-147) with a Jacobi split against
    the dense solve; batched RHS."""
    import jax.numpy as jnp
    from elphdynamics_tpu.solvers import cg_split

    rng = np.random.default_rng(7)
    n = 24
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    d = np.sqrt(np.diag(A))
    Aj = jnp.asarray(A)
    b = rng.standard_normal((3, n, 2))  # batch of 3, field shape [n, 2]
    bj = jnp.asarray(b)

    def apply_A(v):
        return jnp.einsum("ij,...jk->...ik", Aj, v)

    res = cg_split(
        apply_A, bj,
        apply_Linv=lambda v: v / jnp.asarray(d)[:, None],
        apply_LTinv=lambda v: v / jnp.asarray(d)[:, None],
        tol=1e-10, maxiter=500)
    expect = np.linalg.solve(A, b.reshape(3, n, 2).transpose(0, 2, 1).reshape(-1, n).T)
    got = np.asarray(res.x)
    for bi in range(3):
        np.testing.assert_allclose(A @ got[bi], b[bi], atol=1e-6)
    assert np.all(np.asarray(res.converged))
    assert np.all(np.asarray(res.iters) <= 500)


def test_gmres_batched_leading_axes():
    """GMRES carries arbitrary leading batch axes natively (one shared
    Arnoldi loop of stacked matvecs): each batch element solves ITS system
    (the operator acts blockwise) and per-element iteration counts reflect
    per-element difficulty."""
    rng = np.random.default_rng(4)
    n = 16
    easy = np.eye(n) + 0.05 * rng.standard_normal((n, n)) / np.sqrt(n)
    hard = np.eye(n) + 0.45 * rng.standard_normal((n, n)) / np.sqrt(n)
    As = jnp.asarray(np.stack([easy, hard]))       # [2, n, n]
    b = jnp.asarray(rng.standard_normal((2, n, 3)))  # batch axis leading

    res = solvers.gmres(lambda v: jnp.einsum("bij,bjk->bik", As, v), b,
                        tol=1e-10, maxiter=200, restart=8)
    got = np.einsum("bij,bjk->bik", np.asarray(As), np.asarray(res.x))
    assert np.allclose(got, np.asarray(b), atol=1e-6)
    assert res.iters.shape == (2,)
    assert int(res.iters[0]) <= int(res.iters[1])
    assert bool(res.converged.all())

    # 2-D batch shape round-trips too
    b4 = jnp.asarray(rng.standard_normal((2, 2, n, 3)))
    A4 = jnp.broadcast_to(As[None], (2, 2, n, n))
    res4 = solvers.gmres(lambda v: jnp.einsum("cbij,cbjk->cbik", A4, v), b4,
                         tol=1e-8, maxiter=200, restart=8)
    got4 = np.einsum("cbij,cbjk->cbik", np.asarray(A4), np.asarray(res4.x))
    assert np.allclose(got4, np.asarray(b4), atol=1e-5)
    assert res4.iters.shape == (2, 2)


def test_gmres_f32_midcycle_convergence_stays_accurate():
    """Regression: when an element converges in the middle of a restart
    cycle, the remaining Arnoldi columns are noise at the working
    precision's floor; without freezing the converged element's Krylov
    state, back-substitution pulls those near-singular trailing Hessenberg
    diagonals into y and corrupts the solution (~1e-3 true residual in f32
    where the Givens estimate claimed 1e-5). Also covers right
    preconditioning: the estimate must track the TRUE residual (the
    reference's left preconditioning stops up to cond(P) short of it,
    IterativeSolvers.jl:478)."""
    rng = np.random.default_rng(7)
    n = 24
    A = np.eye(n) + 0.2 * rng.standard_normal((n, n)) / np.sqrt(n)
    P = np.linalg.inv(A) + 1e-3 * rng.standard_normal((n, n))  # near-exact
    b = rng.standard_normal((n, 2)).astype(np.float32)
    Af = jnp.asarray(A, jnp.float32)
    Pf = jnp.asarray(P, jnp.float32)
    apply_A = lambda v: jnp.einsum("ij,...jk->...ik", Af, v)
    apply_P = lambda v: jnp.einsum("ij,...jk->...ik", Pf, v)

    for side in ("right", "left"):
        res = solvers.gmres(apply_A, jnp.asarray(b), apply_P=apply_P,
                            tol=1e-5, maxiter=40, restart=20, side=side)
        # converges in a handful of iterations — far inside the cycle
        assert int(res.iters) < 10
        err = float(np.linalg.norm(
            np.einsum("ij,jk->ik", A, np.asarray(res.x, np.float64)) - b)
            / np.linalg.norm(b))
        assert err < 5e-5, (side, err)


# ---------------------------------------------------------------------------
# block CG (solvers.block_cg — beyond reference scope)
# ---------------------------------------------------------------------------

def test_block_cg_matches_dense_solve_batched():
    """[batch, s, n, k] RHS sharing one operator match the dense solve."""
    A, _ = spd_problem(cond=80.0)
    rng = np.random.default_rng(11)
    B = rng.standard_normal((2, 5, 24, 2))
    res = solvers.block_cg(lambda v: jnp.einsum("ij,...jk->...ik", A, v),
                           jnp.asarray(B), tol=1e-10, maxiter=500)
    x = np.asarray(res.x)
    expect = np.linalg.solve(np.asarray(A), B.reshape(-1, 24, 2))
    np.testing.assert_allclose(x.reshape(-1, 24, 2), expect, atol=1e-6)
    assert np.all(np.asarray(res.converged))
    assert res.iters.shape == (2, 5)


def test_block_cg_beats_independent_cg_on_isolated_modes():
    """With a handful of isolated small eigenvalues (the deep-β spectrum
    shape), the shared s-dimensional search block deflates them and
    converges in fewer iterations than independent batched CG."""
    rng = np.random.default_rng(12)
    n = 96
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.concatenate([np.geomspace(1e-4, 1e-3, 6), np.linspace(0.5, 1.0, n - 6)])
    A = jnp.asarray(Q @ np.diag(eigs) @ Q.T)
    B = jnp.asarray(rng.standard_normal((8, n, 1)))
    apply_A = lambda v: jnp.einsum("ij,...jk->...ik", A, v)

    plain = solvers.cg(apply_A, B, tol=1e-8, maxiter=3000)
    blk = solvers.block_cg(apply_A, B, tol=1e-8, maxiter=3000)
    assert np.all(np.asarray(blk.converged))
    got = np.einsum("ij,bjk->bik", np.asarray(A), np.asarray(blk.x))
    np.testing.assert_allclose(got, np.asarray(B), atol=1e-6)
    assert int(np.max(np.asarray(blk.iters))) < int(np.max(np.asarray(plain.iters)))


def test_block_cg_f32_early_column_freeze_stays_accurate():
    """Regression guard (the GMRES mid-cycle lesson): a column converging
    long before the others must freeze out of the shared Gram solves —
    otherwise its tolerance-floor residual drives the direction block
    singular in f32 and corrupts the remaining columns."""
    rng = np.random.default_rng(13)
    n = 64
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.concatenate([np.geomspace(1e-3, 1e-2, 4), np.linspace(0.5, 1.0, n - 4)])
    A64 = Q @ np.diag(eigs) @ Q.T
    A = jnp.asarray(A64, jnp.float32)
    B64 = rng.standard_normal((6, n, 1))
    # column 0 converges almost immediately: make it an exact eigen-direction
    B64[0, :, 0] = Q[:, -1]
    B = jnp.asarray(B64, jnp.float32)
    res = solvers.block_cg(lambda v: jnp.einsum("ij,...jk->...ik", A, v), B,
                           tol=1e-5, maxiter=2000)
    x = np.asarray(res.x, np.float64)
    err = np.linalg.norm(np.einsum("ij,bjk->bik", A64, x) - B64, axis=(1, 2)) \
        / np.linalg.norm(B64, axis=(1, 2))
    assert int(res.iters[0]) < int(np.max(np.asarray(res.iters)))
    assert np.all(err < 5e-4), err


def test_block_solve_checked_fallback_recovers():
    """A bad preconditioner triggers the masked unpreconditioned retry."""
    A, _ = spd_problem(cond=100.0)
    rng = np.random.default_rng(14)
    bad = jnp.asarray(rng.standard_normal((24, 24)))
    B = jnp.asarray(rng.standard_normal((4, 24, 1)))
    res = solvers.block_solve_checked(
        lambda v: jnp.einsum("ij,...jk->...ik", A, v), B,
        apply_P=lambda v: jnp.einsum("ij,...jk->...ik", bad, v),
        tol=1e-8, maxiter=30)
    got = np.einsum("ij,bjk->bik", np.asarray(A), np.asarray(res.x))
    np.testing.assert_allclose(got, np.asarray(B), atol=1e-3)
    assert np.all(np.asarray(res.flag) == 0)


@pytest.mark.slow
def test_block_cg_deep_beta_iteration_regression():
    """Deep-β regression guard (BASELINE.md §block CG): on an equilibrated
    Holstein 4×4 β=16 operator the s=10 estimator block must converge in
    well under half the batched-CG iterations. Catches both block-CG
    regressions and KPM/operator changes that silently re-open the deep-β
    collapse."""
    import jax
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=16.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=1.0, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=8))
    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-5,
                    maxiter=2000, construct_guess=True, guess_order=3)
    step = jax.jit(make_hmc_step(ops, mass, cfg, precond))
    key = jax.random.PRNGKey(0)
    x, key = init_phonons_half_filled(ops, params, key)
    st = HMCState(x=x, v=jnp.zeros_like(x))
    for _ in range(6):
        st, _, key = step(params, st, key)

    derived = ops.derived(params, st.x)
    from elphdynamics_tpu.dynamics.solve import resolve_precond
    pa = resolve_precond(precond, params, st.x)
    R = jax.random.normal(jax.random.PRNGKey(7),
                          (10, ops.Nsites, ops.Ltau), st.x.dtype)
    B = ops.mulMT(params, derived, R)
    A = lambda v: ops.mulMTM(params, derived, v)
    plain = jax.jit(lambda b: solvers.cg(
        A, b, apply_P=pa.symmetric, tol=1e-5, maxiter=4000))(B)
    blk = jax.jit(lambda b: solvers.block_cg(
        A, b, apply_P=pa.symmetric, tol=1e-5, maxiter=4000))(B)
    assert np.all(np.asarray(blk.converged))
    it_plain = float(np.mean(np.asarray(plain.iters)))
    it_blk = float(np.mean(np.asarray(blk.iters)))
    # the deep-β collapse must be present for the plain solver...
    assert it_plain > 40, it_plain
    # ...and the block must cut it by far more than half
    assert it_blk < 0.45 * it_plain, (it_blk, it_plain)
