"""End-to-end sampler tests on the exactly solvable single-site Holstein model.

Mirrors the reference's de-facto integration test strategy (SURVEY.md §4):
its single-site example is exactly diagonalizable, so phonon moments from the
samplers must agree with ED up to Trotter (O(Δτ²)) + statistical error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.dynamics.force import SolverConfig
from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
from elphdynamics_tpu.dynamics.langevin import make_langevin_step
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.ops.fourier_accel import build_Q, build_mass
from ed_reference import single_site_holstein_ed

BETA, DTAU, OMEGA, LAM, MU = 2.0, 0.1, 1.0, 1.0, -0.5
FA_BLOCKS = [dict(omega_min=0.0, omega_max=10.0, mass=1.0)]


def single_site_model():
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(lat, beta=BETA, dtau=DTAU, omega=OMEGA, lam=LAM, mu=MU)
    return make_model_ops(spec), params


def run_chains_hmc(ops, params, cfg, n_chains=48, burnin=80, nsteps=300, seed=0):
    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    step = make_hmc_step(ops, mass, cfg)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    xs = []
    for i in range(n_chains):
        x, _ = init_phonons_half_filled(ops, params, keys[i])
        xs.append(x)
    x = jnp.stack(xs)
    v = jnp.zeros_like(x)
    state = HMCState(x=x, v=v)
    vstep = jax.jit(jax.vmap(lambda s, k: step(params, s, k)))

    def multi(state, keys, n):
        def body(carry, _):
            state, keys = carry
            state, stats, keys = vstep(state, keys)
            return (state, keys), (stats.accepted, state.x)
        (state, keys), (acc, xhist) = jax.lax.scan(body, (state, keys), None, length=n)
        return state, keys, acc, xhist

    multi = jax.jit(multi, static_argnums=2)
    state, keys, _, _ = multi(state, keys, burnin)
    state, keys, acc, xhist = multi(state, keys, nsteps)
    return np.asarray(xhist), np.asarray(acc)


@pytest.mark.slow
def test_hmc_single_site_matches_ed():
    ops, params = single_site_model()
    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-6, maxiter=500)
    xh, acc = run_chains_hmc(ops, params, cfg)
    assert acc.mean() > 0.6, f"HMC acceptance too low: {acc.mean()}"
    ed = single_site_holstein_ed(BETA, OMEGA, LAM, MU)
    x_mean = xh.mean()
    x2_mean = (xh ** 2).mean()
    assert abs(x_mean - ed["x"]) < 0.05, (x_mean, ed["x"])
    assert abs(x2_mean - ed["x2"]) < 0.06, (x2_mean, ed["x2"])


@pytest.mark.slow
def test_hmc_energy_conservation_small_dt():
    """ΔH must be tiny for a fine integrator (validates force vs action)."""
    ops, params = single_site_model()
    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    cfg = HMCConfig(dt=0.002, trajectory_time=0.02, Nb=1, tol=1e-10, maxiter=2000)
    step = make_hmc_step(ops, mass, cfg)
    key = jax.random.PRNGKey(1)
    x, key = init_phonons_half_filled(ops, params, key)
    state = HMCState(x=x, v=jnp.zeros_like(x))
    for _ in range(3):
        state, stats, key = jax.jit(lambda p, s, k: step(p, s, k))(params, state, key)
        assert abs(float(stats.delta_H)) < 1e-4, float(stats.delta_H)
        assert bool(stats.accepted)


@pytest.mark.slow
def test_hmc_exact_discretized_weight_Ltau2():
    """Single site, Lτ=2: the sampled ensemble must match 2-D quadrature of
    the exact discretized weight e^{−Sb}·(det M)²·e^{Δτ·λ·Σx} — a direct
    detailed-balance check, free of Trotter error."""
    beta, dtau, omega, lam, mu = 0.2, 0.1, 1.0, 1.2, -0.4
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(lat, beta=beta, dtau=dtau, omega=omega, lam=lam, mu=mu)
    ops = make_model_ops(spec)

    # quadrature ground truth
    grid = np.linspace(-12, 12, 401)
    X0, X1 = np.meshgrid(grid, grid, indexing="ij")
    Sb = dtau * (omega ** 2 * (X0 ** 2 + X1 ** 2) / 2 + ((X0 - X1) ** 2 + (X1 - X0) ** 2) / (2 * dtau ** 2))
    detM = 1.0 + np.exp(-dtau * (lam * (X0 + X1) - 2 * mu))
    w = np.exp(-Sb + dtau * lam * (X0 + X1)) * detM ** 2
    Z = w.sum()
    x_mean_exact = (w * X0).sum() / Z
    x2_mean_exact = (w * X0 ** 2).sum() / Z

    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-8, maxiter=500)
    mass = build_mass(np.asarray(params.omega), dtau, spec.Ltau, FA_BLOCKS)
    step = make_hmc_step(ops, mass, cfg)
    n_chains = 64
    keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    x = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    state = HMCState(x=x, v=jnp.zeros_like(x))
    vstep = jax.vmap(lambda s, k: step(params, s, k))

    def multi(state, keys, n):
        def body(carry, _):
            state, keys = carry
            state, stats, keys = vstep(state, keys)
            return (state, keys), state.x
        return jax.lax.scan(body, (state, keys), None, length=n)

    multi = jax.jit(multi, static_argnums=2)
    (state, keys), _ = multi(state, keys, 100)
    (state, keys), xhist = multi(state, keys, 500)
    xh = np.asarray(xhist)
    assert abs(xh.mean() - x_mean_exact) < 0.05, (xh.mean(), x_mean_exact)
    assert abs((xh ** 2).mean() - x2_mean_exact) < 0.08, ((xh ** 2).mean(), x2_mean_exact)


@pytest.mark.slow
def test_langevin_single_site_matches_ed():
    ops, params = single_site_model()
    Q = build_Q(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    step = make_langevin_step(ops, Q, dt=0.02, method="rk",
                              scfg=SolverConfig(tol=1e-7, maxiter=500))
    n_chains = 64
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    xs = [init_phonons_half_filled(ops, params, k)[0] for k in keys]
    x = jnp.stack(xs)
    vstep = jax.vmap(lambda x, k: step(params, x, k)[0::2], in_axes=(0, 0))

    def multi(x, keys, n):
        def body(carry, _):
            x, keys = carry
            x, keys = vstep(x, keys)
            return (x, keys), x
        (x, keys), xhist = jax.lax.scan(body, (x, keys), None, length=n)
        return x, keys, xhist

    multi = jax.jit(multi, static_argnums=2)
    x, keys, _ = multi(x, keys, 500)          # burn-in
    x, keys, xhist = multi(x, keys, 1500)
    xh = np.asarray(xhist)
    ed = single_site_holstein_ed(BETA, OMEGA, LAM, MU)
    assert abs(xh.mean() - ed["x"]) < 0.1, (xh.mean(), ed["x"])
    assert abs((xh ** 2).mean() - ed["x2"]) < 0.1, ((xh ** 2).mean(), ed["x2"])


@pytest.mark.slow
def test_langevin_heun_runs_and_stays_sane():
    """Heun integrator (update_method=3) smoke + stability check."""
    ops, params = single_site_model()
    Q = build_Q(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    step = make_langevin_step(ops, Q, dt=0.01, method="heun",
                              scfg=SolverConfig(tol=1e-7, maxiter=500))
    key = jax.random.PRNGKey(7)
    x, key = init_phonons_half_filled(ops, params, key)
    jstep = jax.jit(lambda p, x, k: step(p, x, k))
    for _ in range(50):
        x, stats, key = jstep(params, x, key)
    assert np.all(np.isfinite(np.asarray(x)))
    assert float(jnp.max(jnp.abs(x))) < 50.0


@pytest.mark.slow
def test_hmc_block_trajectory_solves_match_batched():
    """`[solver] block` routes the spin-stacked trajectory solves through
    block CG (solve_oinv gating): with a fixed key the whole trajectory —
    fields, ΔH, acceptance — must agree with the batched-CG step, because
    both solve to the same tolerance and the endpoint tol² solves stay on
    the batched path either way."""
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 2)
    spec, params = H.build_holstein(
        lat, beta=BETA, dtau=DTAU,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=OMEGA, lam=LAM, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    key = jax.random.PRNGKey(3)
    x, key = init_phonons_half_filled(ops, params, key)
    state0 = HMCState(x=x, v=jnp.zeros_like(x))
    outs = {}
    for block in (False, True):
        cfg = HMCConfig(dt=0.05, trajectory_time=0.5, Nb=2, tol=1e-5,
                        maxiter=500, construct_guess=True, guess_order=3,
                        block=block)
        step = jax.jit(make_hmc_step(ops, mass, cfg))
        st, stats, _ = step(params, state0, key)
        assert int(stats.flag) == 0
        assert bool(stats.accepted)
        outs[block] = (np.asarray(st.x), float(stats.delta_H))
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               atol=5e-3)
    assert abs(outs[True][1] - outs[False][1]) < 5e-3


@pytest.mark.slow
def test_2mn_integrator_energy_error_beats_leapfrog():
    """The Omelyan 2MN integrator ([hmc] integrator = "2mn",
    hep-lat/0506011) must cut |ΔH| by ~an order of magnitude vs leapfrog
    at the same dt (its shadow-Hamiltonian coefficient is ~10× smaller),
    and both must conserve H as dt→0."""
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 2)
    spec, params = H.build_holstein(
        lat, beta=BETA, dtau=DTAU,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=OMEGA, lam=LAM, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau, FA_BLOCKS)
    key = jax.random.PRNGKey(11)
    x, key = init_phonons_half_filled(ops, params, key)
    state0 = HMCState(x=x, v=jnp.zeros_like(x))

    def mean_abs_dH(integrator, dt, n=4):
        cfg = HMCConfig(dt=dt, trajectory_time=0.8, Nb=2, tol=1e-9,
                        maxiter=2000, integrator=integrator)
        step = jax.jit(make_hmc_step(ops, mass, cfg))
        st, k, dHs = state0, key, []
        for _ in range(n):
            st, stats, k = step(params, st, k)
            assert int(stats.flag) == 0
            dHs.append(abs(float(stats.delta_H)))
        return np.mean(dHs)

    dH_lf = mean_abs_dH("leapfrog", 0.1)
    dH_2mn = mean_abs_dH("2mn", 0.1)
    assert dH_2mn < dH_lf / 4, (dH_2mn, dH_lf)
    # 2nd-order scaling: ΔH drops ~16x when dt halves (allow slack)
    dH_2mn_half = mean_abs_dH("2mn", 0.05)
    assert dH_2mn_half < dH_2mn / 4, (dH_2mn_half, dH_2mn)


@pytest.mark.slow
def test_hmc_2mn_single_site_matches_ed():
    """The 2MN integrator must sample the same target distribution —
    single-site ED ground truth, run at 2× the leapfrog dt (the point of
    the integrator: larger steps at the same acceptance)."""
    ops, params = single_site_model()
    cfg = HMCConfig(dt=0.1, trajectory_time=1.0, Nb=4, tol=1e-6, maxiter=500,
                    integrator="2mn")
    xh, acc = run_chains_hmc(ops, params, cfg)
    assert acc.mean() > 0.9, f"2MN acceptance too low: {acc.mean()}"
    ed = single_site_holstein_ed(BETA, OMEGA, LAM, MU)
    assert abs(xh.mean() - ed["x"]) < 0.05, (xh.mean(), ed["x"])
    assert abs((xh ** 2).mean() - ed["x2"]) < 0.06, ((xh ** 2).mean(), ed["x2"])


def test_zhist_rotation_matches_unrolled_oracle():
    """The warm-start history tuple (hmc.zhist_*) must reproduce the
    unrolled buffer-rotation semantics: same extrapolated guess at every
    step for every order, newest-first ordering, and a fully frozen
    history once the liveness mask drops."""
    import jax.numpy as jnp
    from elphdynamics_tpu.dynamics.hmc import (
        zhist_guess, zhist_init, zhist_last, zhist_push, zhist_size)

    rng = np.random.default_rng(7)
    z0 = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    zs = [jnp.asarray(rng.normal(size=z0.shape).astype(np.float32))
          for _ in range(11)]

    for order in (1, 2, 3, 4):
        hist = zhist_init(z0, order)
        assert len(hist) == zhist_size(order) == max(1, min(order, 4))
        buf = [z0, z0, z0, z0]  # oracle: explicit buffers, newest first

        def oracle_guess():
            zp, zp2, zp3, zp4 = buf
            if order >= 4:
                return 4.0 * zp - 6.0 * zp2 + 4.0 * zp3 - zp4
            if order == 3:
                return 3.0 * zp - 3.0 * zp2 + zp3
            if order == 2:
                return 2.0 * zp - zp2
            return zp

        for step, z in enumerate(zs):
            np.testing.assert_array_equal(
                np.asarray(zhist_guess(hist, order)),
                np.asarray(oracle_guess()))
            np.testing.assert_array_equal(np.asarray(zhist_last(hist)),
                                          np.asarray(buf[0]))
            ok = jnp.asarray(step < 5)  # freeze after 5 live steps
            hist = zhist_push(hist, z, ok)
            if step < 5:  # the oracle freezes identically
                buf = [z] + buf[:3]
