"""Full-pipeline physics tests.

1. Single-site Holstein: the *measured* density/double-occupancy (through the
   sampler + stochastic estimator + measurement assembly) must match exact
   diagonalization.
2. 4×4 Holstein: HMC and Langevin sample the same ensemble — phonon moments
   and density must agree within combined statistical error (the reference's
   de-facto cross-validation strategy, SURVEY §4).
3. Two-site SSH dimer: sampled density/⟨x⟩/⟨x²⟩ through HMC *and* Langevin
   must match exact diagonalization (the reference's de-facto SSH integration
   test, examples/ssh_hmc_two_site.toml).
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.dynamics.force import SolverConfig
from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
from elphdynamics_tpu.dynamics.langevin import make_langevin_step
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.measure.measurements import (
    MeasurementSpec, make_measurement_step, zero_container, process_bin,
)
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models import ssh as S
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.ops import kpm
from elphdynamics_tpu.ops.fourier_accel import build_Q, build_mass
from ed_reference import (single_site_holstein_ed,
                          two_site_holstein_ed, two_site_ssh_ed)

FA = [dict(omega_min=0.0, omega_max=10.0, mass=1.0)]


def run_hmc_with_measurements(ops, params, cfg, mspec, n_chains, burnin, nmeas,
                              meas_every=1, seed=0, precond=None):
    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau, FA)
    step = make_hmc_step(ops, mass, cfg, precond)
    mstep = make_measurement_step(ops, mspec, SolverConfig(tol=1e-7, maxiter=2000),
                                  precond)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    x = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    state = HMCState(x=x, v=jnp.zeros_like(x))
    vstep = jax.vmap(lambda s, k: step(params, s, k))
    vmeas = jax.vmap(lambda x, k: mstep(params, x, k))

    def chunk(state, keys, n):
        def body(carry, _):
            state, keys = carry
            state, stats, keys = vstep(state, keys)
            return (state, keys), None
        (state, keys), _ = jax.lax.scan(body, (state, keys), None, length=n)
        return state, keys

    chunk = jax.jit(chunk, static_argnums=2)
    state, keys = chunk(state, keys, burnin)
    acc = zero_container(ops, mspec)
    count = 0
    for i in range(nmeas):
        state, keys = chunk(state, keys, meas_every)
        inc, ms, snaps, keys = jax.jit(vmeas)(state.x, keys)
        inc = jax.tree.map(lambda a: jnp.mean(a, axis=0), inc)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
        count += 1
    return process_bin(ops, mspec, acc, bin_size=count), state


def test_single_site_full_pipeline_matches_ed():
    beta, dtau, lam, mu = 2.0, 0.1, 1.0, -0.5
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(lat, beta=beta, dtau=dtau, omega=1.0,
                                    lam=lam, mu=mu)
    ops = make_model_ops(spec)
    ed = single_site_holstein_ed(beta, 1.0, lam, mu)

    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-6, maxiter=1000)
    mspec = MeasurementSpec(nv=10)
    res, state = run_hmc_with_measurements(ops, params, cfg, mspec,
                                           n_chains=24, burnin=60, nmeas=150)
    dens = float(res["global"]["density"])
    docc = float(res["onsite"]["double_occ"][0])
    x2 = float(res["onsite"]["x2"][0])
    assert abs(dens - ed["n"]) < 0.08, (dens, ed["n"])
    assert abs(docc - ed["docc"]) < 0.08, (docc, ed["docc"])
    assert abs(x2 - ed["x2"]) < 0.08, (x2, ed["x2"])


def test_hmc_langevin_agree_4x4():
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.5, mu=0.0,
    )
    ops = make_model_ops(spec)
    precond = None  # KPM covered by dedicated tests; keep this test lean
    mspec = MeasurementSpec(nv=6)

    # --- HMC
    cfg = HMCConfig(dt=0.05, trajectory_time=0.5, Nb=4, tol=1e-6, maxiter=1000)
    res_h, state_h = run_hmc_with_measurements(
        ops, params, cfg, mspec, n_chains=8, burnin=40, nmeas=80,
        precond=precond)

    # --- Langevin (RK)
    Q = build_Q(np.asarray(params.omega), ops.dtau, ops.Ltau, FA)
    lstep = make_langevin_step(ops, Q, dt=0.01, method="rk",
                               scfg=SolverConfig(tol=1e-7, maxiter=2000),
                               precond=precond)
    mstep = make_measurement_step(ops, mspec, SolverConfig(tol=1e-7, maxiter=2000),
                                  precond)
    n_chains = 8
    keys = jax.random.split(jax.random.PRNGKey(5), n_chains)
    x = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    vstep = jax.vmap(lambda x, k: lstep(params, x, k)[0::2])
    vmeas = jax.jit(jax.vmap(lambda x, k: mstep(params, x, k)))

    def lchunk(x, keys, n):
        def body(carry, _):
            x, keys = carry
            x, keys = vstep(x, keys)
            return (x, keys), None
        (x, keys), _ = jax.lax.scan(body, (x, keys), None, length=n)
        return x, keys

    lchunk = jax.jit(lchunk, static_argnums=2)
    x, keys = lchunk(x, keys, 400)
    acc = zero_container(ops, mspec)
    count = 0
    for i in range(80):
        x, keys = lchunk(x, keys, 10)
        inc, ms, snaps, keys = vmeas(x, keys)
        inc = jax.tree.map(lambda a: jnp.mean(a, axis=0), inc)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
        count += 1
    res_l = process_bin(ops, mspec, acc, bin_size=count)

    for key_, tol in (("density", 0.08),):
        a = float(res_h["global"][key_])
        b = float(res_l["global"][key_])
        assert abs(a - b) < tol, (key_, a, b)
    for key_, tol in (("x", 0.1), ("x2", 0.12)):
        a = float(res_h["onsite"][key_][0])
        b = float(res_l["onsite"][key_][0])
        assert abs(a - b) < tol, (key_, a, b)


def _build_ssh_dimer(beta=2.0, dtau=0.1, t=1.0, alpha=0.5, omega=1.0):
    """Two-site SSH dimer matching examples/ssh_hmc_two_site.toml geometry
    (1-D, norbits=2, L=1, one phonon-bearing bond)."""
    uc = UnitCell.create(1, 2, [[1.0]], [[0.0], [0.5]])
    lat = Lattice.create(uc, 1)
    spec, params = S.build_ssh(
        lat, beta=beta, dtau=dtau,
        hoppings=[dict(t=t, t_std=0.0, alpha=alpha, alpha_std=0.0,
                       alpha2=0.0, alpha2_std=0.0, omega=omega, omega_std=0.0,
                       omega4=0.0, omega4_std=0.0, o1=0, o2=1,
                       dL=(0, 0, 0), name="dimer")],
        mu_assignments=[(0.0, 0.0, 0), (0.0, 0.0, 1)])
    return make_model_ops(spec), params


def test_two_site_ssh_dimer_hmc_matches_ed():
    """The de-facto SSH integration test of the reference
    (examples/ssh_hmc_two_site.toml): sampled density/⟨x⟩/⟨x²⟩ through the
    full HMC + estimator + measurement pipeline vs exact diagonalization."""
    beta, dtau, t, alpha, omega = 2.0, 0.1, 1.0, 0.5, 1.0
    ops, params = _build_ssh_dimer(beta, dtau, t, alpha, omega)
    ed = two_site_ssh_ed(beta, omega, t, alpha)

    cfg = HMCConfig(dt=0.1, trajectory_time=1.0, Nb=10, tol=1e-6, maxiter=2000)
    mspec = MeasurementSpec(nv=8)
    res, _ = run_hmc_with_measurements(ops, params, cfg, mspec,
                                       n_chains=24, burnin=80, nmeas=250)
    dens = float(res["global"]["density"])
    xm = float(res["intersite"]["x"][0])
    x2m = float(res["intersite"]["x2"][0])
    assert abs(dens - ed["n"]) < 0.08, (dens, ed["n"])
    assert abs(xm - ed["x"]) < 0.08, (xm, ed["x"])
    assert abs(x2m - ed["x2"]) < 0.1, (x2m, ed["x2"])


def test_two_site_ssh_dimer_langevin_matches_ed():
    beta, dtau, t, alpha, omega = 2.0, 0.1, 1.0, 0.5, 1.0
    ops, params = _build_ssh_dimer(beta, dtau, t, alpha, omega)
    ed = two_site_ssh_ed(beta, omega, t, alpha)

    Q = build_Q(np.asarray(params.omega), ops.dtau, ops.Ltau, FA)
    scfg = SolverConfig(tol=1e-7, maxiter=2000)
    lstep = make_langevin_step(ops, Q, dt=0.02, method="rk", scfg=scfg)
    mstep = make_measurement_step(ops, MeasurementSpec(nv=8), scfg)
    n_chains = 24
    keys = jax.random.split(jax.random.PRNGKey(3), n_chains)
    x = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    vstep = jax.vmap(lambda x, k: lstep(params, x, k)[0::2])
    vmeas = jax.jit(jax.vmap(lambda x, k: mstep(params, x, k)))

    def lchunk(x, keys, n):
        def body(carry, _):
            x, keys = carry
            x, keys = vstep(x, keys)
            return (x, keys), None
        (x, keys), _ = jax.lax.scan(body, (x, keys), None, length=n)
        return x, keys

    lchunk = jax.jit(lchunk, static_argnums=2)
    x, keys = lchunk(x, keys, 300)
    mspec = MeasurementSpec(nv=8)
    acc = zero_container(ops, mspec)
    count = 0
    for i in range(120):
        x, keys = lchunk(x, keys, 5)
        inc, ms, snaps, keys = vmeas(x, keys)
        inc = jax.tree.map(lambda a: jnp.mean(a, axis=0), inc)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
        count += 1
    res = process_bin(ops, mspec, acc, bin_size=count)
    dens = float(res["global"]["density"])
    xm = float(res["intersite"]["x"][0])
    x2m = float(res["intersite"]["x2"][0])
    assert abs(dens - ed["n"]) < 0.08, (dens, ed["n"])
    assert abs(xm - ed["x"]) < 0.1, (xm, ed["x"])
    assert abs(x2m - ed["x2"]) < 0.12, (x2m, ed["x2"])


def test_two_site_holstein_dimer_hmc_matches_ed():
    """Two-site Holstein dimer away from half filling: sampled density,
    ⟨x⟩, ⟨x²⟩, and double occupancy through the full HMC + estimator +
    measurement pipeline vs exact diagonalization (validates the
    hopping/checkerboard + Λ-shift interplay at exact level; the reference
    has no analog test)."""
    beta, dtau, t, omega, lam, mu = 2.0, 0.1, 1.0, 1.0, 0.6, -0.4
    uc = UnitCell.create(1, 2, [[1.0]], [[0.0], [0.5]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(
        lat, beta=beta, dtau=dtau,
        t_assignments=[(t, 0.0, 0, 1, (0, 0, 0))],
        omega=omega, lam=lam, mu=mu)
    ops = make_model_ops(spec)
    ed = two_site_holstein_ed(beta, omega, t, lam, mu=mu)

    cfg = HMCConfig(dt=0.1, trajectory_time=1.0, Nb=10, tol=1e-6, maxiter=2000)
    mspec = MeasurementSpec(nv=8)
    res, _ = run_hmc_with_measurements(ops, params, cfg, mspec,
                                       n_chains=24, burnin=80, nmeas=250)
    dens = float(res["global"]["density"])
    xm = float(np.mean(np.asarray(res["onsite"]["x"])))
    x2m = float(np.mean(np.asarray(res["onsite"]["x2"])))
    docc = float(np.mean(np.asarray(res["onsite"]["double_occ"])))
    assert abs(dens - ed["n"]) < 0.08, (dens, ed["n"])
    assert abs(xm - ed["x"]) < 0.08, (xm, ed["x"])
    assert abs(x2m - ed["x2"]) < 0.1, (x2m, ed["x2"])
    assert abs(docc - ed["docc"]) < 0.08, (docc, ed["docc"])
