"""Site-axis lattice sharding: ppermute-halo checkerboard + psum CG must
reproduce the unsharded operators exactly (SURVEY §5's context-parallel
analog). Runs on the 8 virtual CPU devices provisioned by conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.parallel.lattice_shard import (
    build_shard_plan, make_sharded_holstein_solver, site_mesh)


def _build(L=8, beta=2.0, dtau=0.1, lam=0.8):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=beta, dtau=dtau,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=lam, mu=0.0, dense_threshold=0)  # force the group fold
    return spec, params, make_model_ops(spec)


@pytest.mark.slow
@pytest.mark.parametrize("D", [4, 8])
def test_sharded_matvecs_match_unsharded(D):
    assert jax.device_count() >= D
    spec, params, ops = _build()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    solve, mulM_s, mulMT_s = make_sharded_holstein_solver(spec, plan, mesh)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = 0.3 * jax.random.normal(k1, (spec.Nph, spec.Ltau))
    v = jax.random.normal(k2, (spec.Nsites, spec.Ltau))
    env = ops.derived(params, x)

    ref_M = np.asarray(H.mulM(spec, params, env, v))
    ref_MT = np.asarray(H.mulMT(spec, params, env, v))
    got_M = np.asarray(mulM_s(params, env, v))
    got_MT = np.asarray(mulMT_s(params, env, v))
    np.testing.assert_allclose(got_M, ref_M, atol=1e-12)
    np.testing.assert_allclose(got_MT, ref_MT, atol=1e-12)


@pytest.mark.slow
def test_sharded_cg_solves_MTM(tmp_path):
    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    solve, mulM_s, mulMT_s = make_sharded_holstein_solver(spec, plan, mesh)

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = 0.3 * jax.random.normal(k1, (spec.Nph, spec.Ltau))
    b = jax.random.normal(k2, (spec.Nsites, spec.Ltau))
    env = ops.derived(params, x)

    sol, iters = jax.jit(lambda p, e, bb: solve(p, e, bb, tol=1e-8,
                                                maxiter=2000))(params, env, b)
    # residual of the normal equations against the unsharded operator
    rhs = H.mulMT(spec, params, env, b)
    r = H.mulMTM(spec, params, env, sol) - rhs
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-7, (rel, int(iters))
    assert int(iters) > 0
    # output sharding: solution is distributed over the site axis
    assert len(sol.sharding.device_set) == D


def test_plan_rejects_non_adjacent_bonds():
    """A 4-site chain sharded into 4 blocks of 1 site each: PBC bond 0-3 is
    ring-adjacent, but long-range bonds are not."""
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 8)
    # artificial long-range bond table: site i to i+2
    from elphdynamics_tpu.ops.checkerboard import build_checkerboard_spec
    table = np.asarray([[0, 1, 2, 3, 4, 5, 6, 7],
                        [2, 3, 4, 5, 6, 7, 0, 1]])
    ckb = build_checkerboard_spec(8, table)
    with pytest.raises(NotImplementedError):
        build_shard_plan(ckb, 8)
    # but coarser sharding (blocks of 2) makes the +2 bonds adjacent again
    plan = build_shard_plan(ckb, 4)
    assert plan.B == 2


@pytest.mark.slow
def test_sharded_hmc_step_matches_unsharded():
    """The FULL lattice-sharded HMC update must reproduce the unsharded
    make_hmc_step trajectory (same key, no preconditioner, tight tol) to
    psum-reduction rounding: same accept decision, ΔH, and final field."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=1, tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-6, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-6, atol=1e-8)
    # the output really is distributed
    assert len(xs.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_hmc_with_kpm_matches_unsharded():
    """Sharded HMC with the sharded symmetric KPM preconditioner: same RNG,
    same power-iteration seed — trajectory, ΔH and iteration counts match
    the unsharded KPM-preconditioned step within solver tolerance."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-9, maxiter=2000)
    kcfg = kpm.KPMConfig(max_order=16)

    ref_step = jax.jit(make_hmc_step(
        ops, mass, cfg, kpm.make_symmetric_precond(ops, kcfg)))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg, kpm_cfg=kcfg)

    key = jax.random.PRNGKey(11)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    # preconditioning is actually active: far fewer iterations than the
    # unpreconditioned sharded test needs at this tolerance
    assert int(stats["iters"]) < 60, int(stats["iters"])
    assert abs(int(stats["iters"]) - int(ref_stats.iters)) <= 2


@pytest.mark.slow
def test_sharded_hmc_with_wij_matches_unsharded():
    """ωᵢⱼ phonon dispersion under site sharding: the pair terms are
    evaluated from each owner side with ppermute-fetched partner rows
    (build_wij_plan); trajectory and ΔH must match the unsharded step,
    including boundary-crossing pairs (dL=(0,1)) and sign=-1 pairs."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 4
    assert jax.device_count() >= D
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 8)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.7, mu=0.0, dense_threshold=0,
        wij_assignments=[(0.3, 0.0, 1, 0, 0, (0, 1, 0)),    # crosses shards
                         (0.2, 0.0, -1, 0, 0, (1, 0, 0))])  # shard-local
    assert spec.wij_table.shape[1] > 0
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=1, tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(21)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-6, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_site_sharded_driver_matches_unsharded(tmp_path):
    """`--site-devices`: the production driver with ONE chain's lattice
    sharded over the mesh reproduces the single-device run's measurement
    bins (same seed; trajectories agree to psum rounding)."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    # keep the reflection update firing (freq 2): it runs through the
    # site-sharded special-update path (make_sharded_reflection_update), so
    # this asserts driver-level bin parity across that hand-off too
    cfg["hmc"]["reflection_update"] = {"freq": 2, "nsites": 2}
    cfg["hmc"].pop("swap_update")
    cfg["lattice"]["L"] = 4  # 16 sites over 4 shards: one row each
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            # sharded measurement solves sit in the same CG tolerance
            # ball as the unsharded ones, not bit-identically on it
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])


# ---------------------------------------------------------------------------
# SSH under site sharding (make_sharded_ssh_solver / make_sharded_ssh_hmc_step)
# ---------------------------------------------------------------------------

def _build_ssh_2d(L=8, Ltau=10):
    from elphdynamics_tpu.models import ssh as S

    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = S.build_ssh(
        lat, beta=Ltau * 0.1, dtau=0.1,
        hoppings=[dict(t=1.0, omega=1.0, alpha=0.4, alpha2=0.0,
                       o1=0, o2=0, dL=(1, 0, 0), name="phx"),
                  dict(t=1.0, omega=1.2, alpha=0.3, alpha2=0.1,
                       o1=0, o2=0, dL=(0, 1, 0), name="phy")],
        mu_assignments=[(-0.2, 0.0, None)],
        rng=np.random.default_rng(3),
    )
    return spec, params


@pytest.mark.slow
def test_sharded_ssh_matvecs_and_cg():
    """SSH fermion-matrix applies with the time-dependent halo fold, and the
    psum-CG on MᵀM, against the unsharded SSH operators."""
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_solver

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    solve, mulM_s, mulMT_s = make_sharded_ssh_solver(spec, plan, mesh)

    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    coeffs = S.ckb_coeffs(spec, params, x)
    co = (coeffs[0], coeffs[1])
    v = jax.random.normal(jax.random.PRNGKey(2), (spec.Nsites, spec.Ltau))

    ref_M = np.asarray(S.mulM(spec, params, coeffs, v))
    ref_MT = np.asarray(S.mulMT(spec, params, coeffs, v))
    np.testing.assert_allclose(np.asarray(mulM_s(params, co, v)), ref_M,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(mulMT_s(params, co, v)), ref_MT,
                               atol=1e-11)

    sol, iters = jax.jit(lambda p, c, b: solve(p, c, b, tol=1e-9,
                                               maxiter=3000))(params, co, v)
    rhs = S.mulMT(spec, params, coeffs, v)
    r = S.mulMTM(spec, params, coeffs, sol) - rhs
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-8, (rel, int(iters))
    assert len(sol.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_ssh_hmc_matches_unsharded():
    """FULL sharded SSH HMC (group-fold muldMdx with halo-extended partial
    products, psum force assembly, primary-field tying) reproduces the
    unsharded make_hmc_step trajectory with the same key."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_ssh_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(31)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(12), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(13), (spec.Nph, spec.Ltau))
    v = S.tie_fields(spec, v)

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-6, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_sharded_ssh_hmc_with_kpm_matches_unsharded():
    """Sharded SSH HMC with the sharded symmetric KPM on the τ-averaged
    hopping: trajectory and iteration counts track the unsharded
    KPM-preconditioned step."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.2, Nb=1, tol=1e-9, maxiter=2000)
    kcfg = kpm.KPMConfig(max_order=16)

    ref_step = jax.jit(make_hmc_step(
        ops, mass, cfg, kpm.make_symmetric_precond(ops, kcfg)))
    sh_step = make_sharded_ssh_hmc_step(spec, plan, mesh, mass, cfg,
                                        kpm_cfg=kcfg)

    key = jax.random.PRNGKey(41)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(14), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(15), (spec.Nph, spec.Ltau))
    v = S.tie_fields(spec, v)

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    assert int(stats["iters"]) < 60, int(stats["iters"])


@pytest.mark.slow
def test_site_sharded_ssh_driver_matches_unsharded(tmp_path):
    """`--site-devices` with an SSH model: the production driver reproduces
    the single-device run's measurement bins."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["lattice"]["L"] = 4  # 16 sites over 4 shards
    cfg.pop("holstein")
    cfg["ssh"] = {
        "beta": 1.0, "dtau": 0.1,
        "hopping": [{"t_avg": 1.0, "alpha_avg": 0.2, "omega_avg": 0.5,
                     "orbits": [1, 1], "dL": [1, 0, 0], "name": "x"},
                    {"t_avg": 1.0, "alpha_avg": 0.2, "omega_avg": 0.5,
                     "orbits": [1, 1], "dL": [0, 1, 0], "name": "y"}],
        "mu": [{"orbit": [1], "val": 0.0}],
    }
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"].pop("reflection_update")
    cfg["hmc"].pop("swap_update", None)
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            # sharded measurement solves sit in the same CG tolerance
            # ball as the unsharded ones, not bit-identically on it
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])


# ---------------------------------------------------------------------------
# Sharded Langevin (make_sharded_langevin_step / make_sharded_ssh_langevin_step)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["euler", "rk", "heun"])
@pytest.mark.slow
def test_sharded_langevin_matches_unsharded(method):
    """Holstein Langevin under site sharding: same key → same stochastic
    force vectors → identical trajectory (to psum rounding) for all three
    integrators, including wij dispersion."""
    from elphdynamics_tpu.dynamics.langevin import make_langevin_step
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.ops.fourier_accel import build_Q
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_langevin_step

    D = 4
    assert jax.device_count() >= D
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 8)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.7, mu=0.0, dense_threshold=0,
        wij_assignments=[(0.3, 0.0, 1, 0, 0, (0, 1, 0))])
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    Q = build_Q(np.asarray(params.omega), spec.dtau, spec.Ltau,
                [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    scfg = SolverConfig(tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_langevin_step(ops, Q, 0.01, method, scfg, None))
    sh_step = make_sharded_langevin_step(spec, plan, mesh, Q, 0.01, method,
                                         scfg)

    key = jax.random.PRNGKey(51)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(16), (spec.Nph, spec.Ltau))

    x_ref, stats_ref, _ = ref_step(params, x, key)
    x_sh, stats_sh, _ = sh_step(params, x, key)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    assert int(stats_sh["flag"]) == 0
    assert len(x_sh.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_ssh_langevin_matches_unsharded():
    """SSH Langevin under site sharding (replicated bond field, psum force)."""
    from elphdynamics_tpu.dynamics.langevin import make_langevin_step
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops.fourier_accel import build_Q
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_ssh_langevin_step)

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    Q = build_Q(np.asarray(params.omega), spec.dtau, spec.Ltau,
                [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    scfg = SolverConfig(tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_langevin_step(ops, Q, 0.01, "rk", scfg, None))
    sh_step = make_sharded_ssh_langevin_step(spec, plan, mesh, Q, 0.01, "rk",
                                             scfg)

    key = jax.random.PRNGKey(61)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(17), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)

    x_ref, stats_ref, _ = ref_step(params, x, key)
    x_sh, stats_sh, _ = sh_step(params, x, key)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    assert int(stats_sh["flag"]) == 0


@pytest.mark.slow
def test_site_sharded_langevin_driver_matches_unsharded(tmp_path):
    """`--site-devices` with Langevin dynamics: driver parity of the
    measurement bins against the single-device run."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["lattice"]["L"] = 4
    cfg.pop("hmc")
    cfg["langevin"] = {
        "burnin_timesteps": 4, "simulation_timesteps": 8, "meas_freq": 2,
        "dt": 0.01, "update_method": 2,
    }
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        simulate(cfg, site_devices=sd)
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            # sharded measurement solves sit in the same CG tolerance
            # ball as the unsharded ones, not bit-identically on it
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])


@pytest.mark.slow
def test_chain_site_2d_mesh_hmc():
    """2-D (chain × site) mesh: 2 chains × 4 site shards over 8 virtual
    devices. Each chain's trajectory must match the 1-chain unsharded step
    with the same key (chain axis is pure data parallel)."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_hmc_step)

    Dc, Ds = 2, 4
    assert jax.device_count() >= Dc * Ds
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, Ds)
    mesh = chain_site_mesh(Dc, Ds)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg,
                                    chains_axis="chain")

    n_chains = 4   # 2 per chain-shard
    keys = jax.random.split(jax.random.PRNGKey(71), n_chains)
    xs = 0.3 * jax.random.normal(jax.random.PRNGKey(18),
                                 (n_chains, spec.Nph, spec.Ltau))
    vs = 0.1 * jax.random.normal(jax.random.PRNGKey(19),
                                 (n_chains, spec.Nph, spec.Ltau))

    x_sh, v_sh, stats, _ = sh_step(params, xs, vs, keys)
    assert len(x_sh.sharding.device_set) == Dc * Ds

    for c in range(n_chains):
        ref_state, ref_stats, _ = ref_step(
            params, HMCState(x=xs[c], v=vs[c]), keys[c])
        assert bool(stats["accepted"][c]) == bool(ref_stats.accepted), c
        assert abs(float(stats["delta_H"][c])
                   - float(ref_stats.delta_H)) < 1e-6, c
        np.testing.assert_allclose(np.asarray(x_sh[c]),
                                   np.asarray(ref_state.x),
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_combined_chain_site_driver(tmp_path):
    """`--chains 4 --devices 2 --site-devices 4`: the full driver on a 2-D
    (chain × site) mesh reproduces the plain 4-chain single-device run."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["lattice"]["L"] = 4
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    # reflection stays on: on the 2-D mesh it runs through the chain-vmapped
    # site-sharded special-update path (make_sharded_reflection_update)
    cfg["hmc"]["reflection_update"] = {"freq": 2, "nsites": 2}
    cfg["hmc"].pop("swap_update")
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, (nd, sd) in (("one", (1, 1)), ("mesh2d", (2, 4))):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, n_chains=4, n_devices=nd, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["mesh2d"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            # sharded measurement solves sit in the same CG tolerance
            # ball as the unsharded ones, not bit-identically on it
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])


@pytest.mark.slow
def test_sharded_hmc_warm_start_matches_unsharded():
    """construct_guess + quadratic extrapolation inside the sharded step:
    same guess formula and RNG as the unsharded path → same trajectory."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.5, Nb=1, tol=1e-10, maxiter=3000,
                    construct_guess=True, guess_order=3)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(81)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(20), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(22), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-6
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_sharded_greens_sampler_matches_unsharded():
    """The site-sharded nᵥ-vector Green's-function sampler draws the SAME
    random vectors as measure.greens.sample_greens (exact key-split parity)
    and solves MᵀM·z = Mᵀ·R within the solver tolerance of the unsharded
    solutions — measurements under --site-devices never run an unsharded
    MᵀM solve."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.measure import greens as G
    from elphdynamics_tpu.ops.kpm import KPMConfig
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_greens_sampler)

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    nv = 4
    scfg = SolverConfig(tol=1e-7, maxiter=2000)
    sampler = make_sharded_greens_sampler(spec, plan, mesh, nv, scfg,
                                          kpm_cfg=KPMConfig(max_order=8))

    key = jax.random.PRNGKey(5)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (spec.Nph, spec.Ltau))
    R, MinvR, iters, flag, key_out = sampler(params, x, key)

    gd, key_ref = G.sample_greens(ops, params, x, key, nv, scfg, None)
    np.testing.assert_allclose(np.asarray(R), np.asarray(gd.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(key_out), np.asarray(key_ref))
    assert int(flag) == 0
    # both solutions sit in the tol ball around the true M⁻¹R
    np.testing.assert_allclose(np.asarray(MinvR), np.asarray(gd.MinvR),
                               atol=2e-5)
    # solves actually ran distributed
    assert len(MinvR.sharding.device_set) == D
    assert int(iters) > 0


@pytest.mark.slow
def test_sharded_ssh_greens_sampler_matches_unsharded():
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.measure import greens as G
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.models.adapter import make_model_ops as mmo
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_ssh_greens_sampler)

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d()
    ops = mmo(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    nv = 3
    scfg = SolverConfig(tol=1e-7, maxiter=3000)
    sampler = make_sharded_ssh_greens_sampler(spec, plan, mesh, nv, scfg)

    key = jax.random.PRNGKey(7)
    x = S.tie_fields(spec, 0.2 * jax.random.normal(
        jax.random.PRNGKey(8), (spec.Nph, spec.Ltau)))
    R, MinvR, iters, flag, key_out = sampler(params, x, key)
    gd, key_ref = G.sample_greens(ops, params, x, key, nv, scfg, None)
    np.testing.assert_allclose(np.asarray(R), np.asarray(gd.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(key_out), np.asarray(key_ref))
    assert int(flag) == 0
    np.testing.assert_allclose(np.asarray(MinvR), np.asarray(gd.MinvR),
                               atol=2e-5)
    assert len(MinvR.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_greens_sampler_block_cg_matches_unsharded():
    """`[solver] block` under --site-devices: the psum-aware block CG
    (solvers.block_cg psum_axis) reproduces the unsharded solutions within
    the tolerance ball, with the exact key-split parity of the default
    sharded path."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.measure import greens as G
    from elphdynamics_tpu.ops.kpm import KPMConfig
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_greens_sampler)

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    nv = 4
    scfg = SolverConfig(tol=1e-7, maxiter=2000, block=True)
    sampler = make_sharded_greens_sampler(spec, plan, mesh, nv, scfg,
                                          kpm_cfg=KPMConfig(max_order=8))

    key = jax.random.PRNGKey(5)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (spec.Nph, spec.Ltau))
    R, MinvR, iters, flag, key_out = sampler(params, x, key)
    gd, key_ref = G.sample_greens(ops, params, x, key, nv, scfg, None)
    np.testing.assert_allclose(np.asarray(R), np.asarray(gd.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(key_out), np.asarray(key_ref))
    assert int(flag) == 0
    np.testing.assert_allclose(np.asarray(MinvR), np.asarray(gd.MinvR),
                               atol=2e-5)
    assert len(MinvR.sharding.device_set) == D
    assert int(iters) > 0


@pytest.mark.slow
def test_sharded_hmc_block_trajectory_matches_unsharded():
    """`[solver] block` in the site-sharded HMC: the psum-aware s=2 block
    CG on the spin-stacked trajectory solves reproduces the unsharded
    block-CG step (same key, tol¹ block / tol² batched gating on both
    sides)."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=1, tol=1e-5,
                    maxiter=3000, block=True)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)
    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert int(stats["flag"]) == 0
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 5e-4
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_chain_site_2d_mesh_hmc_block():
    """Block CG on the 2-D (chain × site) mesh: the sync_axis-coupled
    while_loop (solvers.block_cg) must keep cross-row collectives aligned
    — each chain still matches its 1-chain unsharded block-CG step."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_hmc_step)

    Dc, Ds = 2, 4
    assert jax.device_count() >= Dc * Ds
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, Ds)
    mesh = chain_site_mesh(Dc, Ds)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-5,
                    maxiter=3000, block=True)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg,
                                    chains_axis="chain")

    n_chains = 4
    keys = jax.random.split(jax.random.PRNGKey(71), n_chains)
    xs = 0.3 * jax.random.normal(jax.random.PRNGKey(18),
                                 (n_chains, spec.Nph, spec.Ltau))
    vs = 0.1 * jax.random.normal(jax.random.PRNGKey(19),
                                 (n_chains, spec.Nph, spec.Ltau))
    x_sh, v_sh, stats, _ = sh_step(params, xs, vs, keys)
    for c in range(n_chains):
        ref_state, ref_stats, _ = ref_step(
            params, HMCState(x=xs[c], v=vs[c]), keys[c])
        assert bool(stats["accepted"][c]) == bool(ref_stats.accepted), c
        assert abs(float(stats["delta_H"][c])
                   - float(ref_stats.delta_H)) < 5e-4, c
        np.testing.assert_allclose(np.asarray(x_sh[c]),
                                   np.asarray(ref_state.x),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_reflection_update_matches_unsharded():
    """Site-sharded reflection update: same key ⇒ same accept decisions and
    final field as dynamics/special_updates.make_reflection_update (the
    Metropolis solves run on the mesh instead of gathered)."""
    from elphdynamics_tpu.dynamics.special_updates import (
        SpecialUpdateConfig, make_reflection_update)
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_reflection_update)

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    cfg = SpecialUpdateConfig(freq=1, n_moves=5, tol=1e-4, maxiter=3000)

    ref = jax.jit(make_reflection_update(ops, cfg))
    sh = make_sharded_reflection_update(spec, plan, mesh, cfg)

    key = jax.random.PRNGKey(3)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(9),
                                (spec.Nph, spec.Ltau)) + 0.3

    x_ref, acc_ref, _ = ref(params, x, key)
    x_sh, acc_sh, _ = sh(params, x, key)

    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-12)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-8)
    assert len(x_sh.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_swap_update_matches_unsharded():
    """Site-sharded Holstein swap update (cross-shard worldline exchange via
    psum row gathers) + the sharded KPM-preconditioned Metropolis solve."""
    from elphdynamics_tpu.dynamics.special_updates import (
        SpecialUpdateConfig, make_swap_update)
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_swap_update)

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    cfg = SpecialUpdateConfig(freq=1, n_moves=5, tol=1e-4, maxiter=3000)
    kcfg = kpm.KPMConfig(max_order=16)

    ref = jax.jit(make_swap_update(ops, cfg,
                                   kpm.make_symmetric_precond(ops, kcfg)))
    sh = make_sharded_swap_update(spec, plan, mesh, cfg, kpm_cfg=kcfg)

    key = jax.random.PRNGKey(5)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(8),
                                (spec.Nph, spec.Ltau)) + 0.2

    x_ref, acc_ref, _ = ref(params, x, key)
    x_sh, acc_sh, _ = sh(params, x, key)

    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-12)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-8)
    assert len(x_sh.sharding.device_set) == D


@pytest.mark.slow
def test_sharded_ssh_swap_update_matches_unsharded():
    """SSH swap update under site sharding: the bond-phonon field stays
    replicated, the tol² Metropolis solves shard over the electron sites."""
    from elphdynamics_tpu.dynamics.special_updates import (
        SpecialUpdateConfig, make_swap_update)
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_swap_update)

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d()
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    cfg = SpecialUpdateConfig(freq=1, n_moves=4, tol=1e-4, maxiter=3000)

    ref = jax.jit(make_swap_update(ops, cfg))
    sh = make_sharded_swap_update(spec, plan, mesh, cfg, is_holstein=False)

    key = jax.random.PRNGKey(6)
    x = S.tie_fields(spec, 0.3 * jax.random.normal(
        jax.random.PRNGKey(4), (spec.Nph, spec.Ltau)))

    x_ref, acc_ref, _ = ref(params, x, key)
    x_sh, acc_sh, _ = sh(params, x, key)

    assert float(acc_sh) == pytest.approx(float(acc_ref), abs=1e-12)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_combined_mesh_special_updates_match_vmapped():
    """2-D (chain × site) mesh special updates: per-chain keys drive
    per-chain moves; results match the chain-vmapped unsharded updates."""
    from elphdynamics_tpu.dynamics.special_updates import (
        SpecialUpdateConfig, make_reflection_update, make_swap_update)
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_reflection_update,
        make_sharded_swap_update)

    C, D = 2, 2
    assert jax.device_count() >= C * D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = chain_site_mesh(C, D)
    cfg = SpecialUpdateConfig(freq=1, n_moves=3, tol=1e-4, maxiter=3000)

    keys = jax.random.split(jax.random.PRNGKey(2), C)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(7),
                                (C, spec.Nph, spec.Ltau)) + 0.3

    for maker, ref_maker, kw in (
            (make_sharded_reflection_update, make_reflection_update, {}),
            (make_sharded_swap_update, make_swap_update,
             dict(is_holstein=True))):
        sh = maker(spec, plan, mesh, cfg, chains_axis="chain", **kw)
        ref = jax.jit(jax.vmap(ref_maker(ops, cfg), in_axes=(None, 0, 0)))
        x_ref, acc_ref, _ = ref(params, x, keys)
        x_sh, acc_sh, _ = sh(params, x, keys)
        np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                                   rtol=1e-6, atol=1e-8)
        assert len(x_sh.sharding.device_set) == C * D


@pytest.mark.slow
def test_combined_mesh_special_updates_stacked_params():
    """Tempering composition (VERDICT r4 item 7): per-rung stacked params
    ride params_axis=0 through the site-sharded special updates on the 2-D
    chain x site mesh — accept decisions and final fields match the
    chain-vmapped unsharded updates at per-chain couplings (the gathering
    fallback the driver used for tempering is gone)."""
    from elphdynamics_tpu.dynamics.special_updates import (
        SpecialUpdateConfig, make_reflection_update, make_swap_update)
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_reflection_update,
        make_sharded_swap_update)

    C, D = 2, 2
    assert jax.device_count() >= C * D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = chain_site_mesh(C, D)
    cfg = SpecialUpdateConfig(freq=1, n_moves=3, tol=1e-4, maxiter=3000)

    # rung 1 at 0.5x the coupling (ladder_params semantics)
    pstack = jax.tree.map(
        lambda a: jnp.stack([a, a]) if a is not None else None, params)
    pstack = pstack._replace(lam=pstack.lam.at[1].mul(0.5))

    keys = jax.random.split(jax.random.PRNGKey(12), C)
    x = 0.4 * jax.random.normal(jax.random.PRNGKey(17),
                                (C, spec.Nph, spec.Ltau)) + 0.3

    for maker, ref_maker, kw in (
            (make_sharded_reflection_update, make_reflection_update, {}),
            (make_sharded_swap_update, make_swap_update,
             dict(is_holstein=True))):
        sh = maker(spec, plan, mesh, cfg, chains_axis="chain",
                   params_axis=0, **kw)
        ref = jax.jit(jax.vmap(ref_maker(ops, cfg), in_axes=(0, 0, 0)))
        x_ref, acc_ref, _ = ref(pstack, x, keys)
        x_sh, acc_sh, _ = sh(pstack, x, keys)
        np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                                   rtol=1e-6, atol=1e-8)
        assert len(x_sh.sharding.device_set) == C * D


# ---------------------------------------------------------------------------
# round-4 composition closures: verbose traces, dynamic dt, 2-D Langevin,
# per-rung stacked params (VERDICT r3 items 4 & 8)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sharded_hmc_verbose_traj_matches_unsharded():
    """cfg.log_verbose under sharding must reproduce the unsharded
    per-timestep traj_H/S/K/iters rows (HMC.jl:285-304 verbose parity)."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=1, tol=1e-10,
                    maxiter=3000, log_verbose=True)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(3)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))
    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert stats["traj_H"].shape == (cfg.Nt,)
    np.testing.assert_allclose(np.asarray(stats["traj_H"]),
                               np.asarray(ref_stats.traj_H), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["traj_S"]),
                               np.asarray(ref_stats.traj_S), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["traj_K"]),
                               np.asarray(ref_stats.traj_K), rtol=1e-6)


@pytest.mark.slow
def test_sharded_hmc_dynamic_dt_matches_static():
    """The dynamic_dt sharded step fed cfg.dt as a traced scalar must equal
    the static-cfg sharded step (the tune_dt x --site-devices contract)."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=2, tol=1e-8, maxiter=2000)

    st_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)
    dy_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg,
                                    dynamic_dt=True)
    key = jax.random.PRNGKey(11)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))
    xs, vs, st, _ = st_step(params, x, v, key)
    xd, vd, dyn, _ = dy_step(params, x, v, key, jnp.asarray(cfg.dt, x.dtype))
    np.testing.assert_allclose(np.asarray(xd), np.asarray(xs), atol=1e-10)
    assert abs(float(dyn["delta_H"]) - float(st["delta_H"])) < 1e-8
    # a different traced dt runs WITHOUT retracing and changes the result
    xd2, _, dyn2, _ = dy_step(params, x, v, key, jnp.asarray(0.05, x.dtype))
    assert abs(float(dyn2["delta_H"]) - float(dyn["delta_H"])) > 0


@pytest.mark.slow
def test_sharded_langevin_2d_chain_mesh_matches_unsharded():
    """Langevin on the combined chain x site mesh (previously HMC-only)
    reproduces the vmapped unsharded step per chain."""
    from elphdynamics_tpu.dynamics.langevin import make_langevin_step
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.ops.fourier_accel import build_Q
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_langevin_step)

    n_chain, D = 2, 4
    assert jax.device_count() >= n_chain * D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = chain_site_mesh(n_chain, D)
    Q = build_Q(np.asarray(params.omega), spec.dtau, spec.Ltau,
                [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    scfg = SolverConfig(tol=1e-9, maxiter=3000)

    sh = make_sharded_langevin_step(spec, plan, mesh, Q, 0.01, "rk", scfg,
                                    chains_axis="chain")
    ref = jax.jit(jax.vmap(make_langevin_step(ops, Q, 0.01, "rk", scfg, None),
                           in_axes=(None, 0, 0)))
    keys = jax.random.split(jax.random.PRNGKey(4), n_chain)
    xs = 0.3 * jax.random.normal(jax.random.PRNGKey(5),
                                 (n_chain, spec.Nph, spec.Ltau))
    x_sh, st_sh, _ = sh(params, xs, keys)
    x_ref, st_ref, _ = ref(params, xs, keys)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_hmc_2d_stacked_params_matches_unsharded():
    """params_axis=0 on the combined mesh (parallel tempering's per-rung
    ladder): each chain runs at its own coupling."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import (
        chain_site_mesh, make_sharded_hmc_step)

    n_chain, D = 2, 4
    assert jax.device_count() >= n_chain * D
    spec, params, ops = _build(L=4, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = chain_site_mesh(n_chain, D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-9, maxiter=3000)

    # rung 1 at 0.5x the coupling (ladder_params semantics)
    pstack = jax.tree.map(
        lambda a: jnp.stack([a, a]) if a is not None else None, params)
    pstack = pstack._replace(lam=pstack.lam.at[1].mul(0.5))

    sh = make_sharded_hmc_step(spec, plan, mesh, mass, cfg,
                               chains_axis="chain", params_axis=0)
    ref = jax.jit(jax.vmap(make_hmc_step(ops, mass, cfg, precond=None),
                           in_axes=(0, 0, 0)))
    keys = jax.random.split(jax.random.PRNGKey(9), n_chain)
    xs = 0.3 * jax.random.normal(jax.random.PRNGKey(8),
                                 (n_chain, spec.Nph, spec.Ltau))
    vs = jnp.zeros_like(xs)
    x_sh, v_sh, st_sh, _ = sh(pstack, xs, vs, keys)
    ref_state, ref_stats, _ = ref(pstack, HMCState(x=xs, v=vs), keys)
    np.testing.assert_allclose(np.asarray(st_sh["delta_H"]),
                               np.asarray(ref_stats.delta_H),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    # the two chains really ran different couplings
    assert abs(float(st_sh["delta_H"][0] - st_sh["delta_H"][1])) > 0


@pytest.mark.slow
def test_tune_dt_composes_with_site_devices(tmp_path):
    """[hmc] tune_dt under --site-devices (the round-3 carve-out,
    simulation.py NotImplementedError): the sharded dynamic-dt burnin step
    tunes and the sampling phase freezes the averaged dt."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["hmc"]["burnin_updates"] = 6
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"]["tune_dt"] = True
    cfg["hmc"]["target_acceptance"] = 0.7
    cfg["hmc"].pop("reflection_update", None)
    cfg["hmc"].pop("swap_update", None)
    cfg["lattice"]["L"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["filepath"] = str(tmp_path)
    stats = simulate(cfg, site_devices=4)
    assert "tuned_dt" in stats and stats["tuned_dt"] > 0
    assert 0.0 <= stats["acceptance_rate"] <= 1.0


@pytest.mark.slow
def test_tempering_composes_with_site_devices(tmp_path):
    """[tempering] on the combined chain x site mesh: per-rung stacked
    params ride params_axis=0 through the sharded HMC step AND the
    site-sharded special updates (reflection/swap stay enabled — the
    gathering fallback for tempering is gone, VERDICT r4 item 7), exchanges
    run as the global jit, rung-0 chains bin."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["lattice"]["L"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["tempering"] = {"ladder": [1.0, 0.8], "freq": 2}
    stats = simulate(cfg, n_chains=2, site_devices=4)
    assert "tempering_acceptance_rate" in stats
    assert 0.0 <= stats["acceptance_rate"] <= 1.0
    run = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(
        run, "global_measurements_f", "global_measurements_00001.out"))


@pytest.mark.slow
def test_tempering_composes_with_site_devices_langevin(tmp_path):
    """[tempering] x --site-devices with Langevin dynamics (the last
    dynamics-type hole in the composition matrix, VERDICT r3 item 4): the
    per-rung stacked params ride params_axis=0 through the sharded Langevin
    step on the combined chain x site mesh."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg.pop("hmc")
    cfg["langevin"] = {
        "burnin_timesteps": 2, "simulation_timesteps": 4, "meas_freq": 2,
        "dt": 0.01, "update_method": 2,
    }
    cfg["lattice"]["L"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["tempering"] = {"ladder": [1.0, 0.8], "freq": 2}
    stats = simulate(cfg, n_chains=2, site_devices=4)
    assert "tempering_acceptance_rate" in stats
    run = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(
        run, "global_measurements_f", "global_measurements_00001.out"))


@pytest.mark.slow
def test_sharded_hmc_deflation_matches_unsharded():
    """[solver.deflation] under --site-devices (VERDICT r3 item 4): the
    shard-local refresh (CholeskyQR2 orthonormalization, psum'd power
    iteration and k×k Grams) spans the same subspace as the unsharded QR
    refresh — the A-orthogonal projector only sees span(W) — so the
    deflated sharded trajectory reproduces the unsharded one to rounding."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build(L=8, beta=1.0, dtau=0.1, lam=0.8)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10, maxiter=3000,
                    deflate_k=6, deflate_filter=4, deflate_power=2)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))
    defl0 = init_deflation(ops, cfg, jax.random.PRNGKey(99))

    ref_state, ref_stats, _ = ref_step(
        params, HMCState(x=x, v=v, defl=defl0), key)
    xs, vs, stats, _, defl_s = sh_step(params, x, v, key, defl0)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    # both refreshes filtered the same starting basis: the subspaces must
    # coincide (principal angles ≈ 0 ⇔ singular values of Wr·Wsᵀ ≈ 1)
    k = cfg.deflate_k
    Wr = np.asarray(ref_state.defl.W).reshape(k, -1)
    Ws = np.asarray(defl_s.W).reshape(k, -1)
    s = np.linalg.svd(Wr @ Ws.T, compute_uv=False)
    assert s.min() > 0.99, s
    # the state came back distributed over the mesh
    assert len(defl_s.W.sharding.device_set) == D


@pytest.mark.slow
def test_site_sharded_driver_with_deflation(tmp_path):
    """Driver-level composition: [solver.deflation] + --site-devices (the
    former NotImplementedError carve-out) reproduces the unsharded deflated
    run's measurement bins."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"].pop("reflection_update", None)
    cfg["hmc"].pop("swap_update", None)
    cfg["lattice"]["L"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False
    cfg.setdefault("solver", {})["deflation"] = {
        "k": 4, "filter_degree": 4, "power_iters": 2}

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for kk in g1:
            assert abs(g1[kk] - g8[kk]) < 1e-5 * (1.0 + abs(g1[kk])), \
                (b, kk, g1[kk], g8[kk])


@pytest.mark.slow
def test_sharded_ssh_hmc_deflation_matches_unsharded():
    """SSH variant of the deflation×site composition: the basis lives in
    the electron-vector space ([k, B, Lτ] local blocks against the
    replicated bond field) and must reproduce the unsharded deflated
    trajectory."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10, maxiter=3000,
                    deflate_k=4, deflate_filter=4, deflate_power=2)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_ssh_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(31)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(12), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(13), (spec.Nph, spec.Ltau))
    v = S.tie_fields(spec, v)
    defl0 = init_deflation(ops, cfg, jax.random.PRNGKey(99))

    ref_state, ref_stats, _ = ref_step(
        params, HMCState(x=x, v=v, defl=defl0), key)
    xs, vs, stats, _, defl_s = sh_step(params, x, v, key, defl0)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    k = cfg.deflate_k
    Wr = np.asarray(ref_state.defl.W).reshape(k, -1)
    Ws = np.asarray(defl_s.W).reshape(k, -1)
    s = np.linalg.svd(Wr @ Ws.T, compute_uv=False)
    assert s.min() > 0.99, s


# ---------------------------------------------------------------------------
# Complex hopping (Peierls phases / twisted BCs) under site sharding: the
# halo fold applies conj(s) on the second bond endpoint (ShardPlan.is_lo),
# the psum CG runs under the Re-Hermitian inner product, and the sharded
# KPM uses the full-spectrum complex pipeline (parallel/lattice_shard.py)
# ---------------------------------------------------------------------------

def _build_twisted(L=8, beta=1.0, dtau=0.1, lam=0.8, twist=(0.7, 0.3)):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=beta, dtau=dtau,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=lam, mu=0.0, twist=twist, dense_threshold=0)
    return spec, params, make_model_ops(spec)


@pytest.mark.slow
def test_sharded_complex_matvecs_and_cg():
    """Twisted-BC fold + psum CG against the unsharded complex operators."""
    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build_twisted()
    assert np.iscomplexobj(np.asarray(params.cosht))
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    solve, mulM_s, mulMT_s = make_sharded_holstein_solver(spec, plan, mesh)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = 0.3 * jax.random.normal(k1, (spec.Nph, spec.Ltau))
    v = (jax.random.normal(k2, (spec.Nsites, spec.Ltau))
         + 1j * jax.random.normal(k3, (spec.Nsites, spec.Ltau)))
    env = ops.derived(params, x)

    np.testing.assert_allclose(np.asarray(mulM_s(params, env, v)),
                               np.asarray(H.mulM(spec, params, env, v)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(mulMT_s(params, env, v)),
                               np.asarray(H.mulMT(spec, params, env, v)),
                               atol=1e-12)

    sol, iters = jax.jit(lambda p, e, b: solve(p, e, b, tol=1e-9,
                                               maxiter=3000))(params, env, v)
    rhs = H.mulMT(spec, params, env, v)
    r = H.mulMTM(spec, params, env, sol) - rhs
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-7, (rel, int(iters))


@pytest.mark.slow
@pytest.mark.parametrize("use_kpm", [False, True])
def test_sharded_complex_hmc_matches_unsharded(use_kpm):
    """Twisted-BC sharded HMC (incl. the full-spectrum complex sharded KPM)
    reproduces the unsharded complex trajectory: same accept, ΔH, iters."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build_twisted()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.4, Nb=1, tol=1e-10, maxiter=3000)
    kcfg = kpm.KPMConfig(max_order=8) if use_kpm else None
    precond = kpm.make_symmetric_precond(ops, kcfg) if use_kpm else None

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=precond))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg, kpm_cfg=kcfg)

    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-6
    assert int(stats["iters"]) == int(ref_stats.iters)
    if use_kpm:
        # the sharded complex KPM must actually precondition, not no-op
        assert int(stats["iters"]) < 40
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_sharded_complex_langevin_matches_unsharded():
    """Twisted-BC sharded Langevin: the circular complex probe draws follow
    the unsharded key stream; trajectories agree to psum rounding."""
    from elphdynamics_tpu.dynamics.langevin import make_langevin_step
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.ops.fourier_accel import build_Q
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_langevin_step

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build_twisted()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    Q = build_Q(np.asarray(params.omega), spec.dtau, spec.Ltau,
                [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    scfg = SolverConfig(tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_langevin_step(ops, Q, 0.01, "rk", scfg, None))
    sh_step = make_sharded_langevin_step(spec, plan, mesh, Q, 0.01, "rk", scfg)

    key = jax.random.PRNGKey(51)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(16), (spec.Nph, spec.Ltau))

    x_ref, _, _ = ref_step(params, x, key)
    x_sh, stats_sh, _ = sh_step(params, x, key)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    assert int(stats_sh["flag"]) == 0


@pytest.mark.slow
def test_sharded_complex_greens_matches_unsharded():
    """Twisted-BC sharded estimator sampler: identical complex probes R
    (trace_noise key parity) and M⁻¹R within the solver tolerance ball."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.measure.greens import sample_greens
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_greens_sampler)

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build_twisted()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    scfg = SolverConfig(tol=1e-10, maxiter=3000)
    nv = 3
    sampler = make_sharded_greens_sampler(spec, plan, mesh, nv, scfg)

    key = jax.random.PRNGKey(5)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (spec.Nph, spec.Ltau))

    gd, _ = sample_greens(ops, params, x, key, nv, scfg, None)
    R, MinvR, iters, flag, _ = sampler(params, x, key)

    assert np.iscomplexobj(np.asarray(R))
    np.testing.assert_allclose(np.asarray(R), np.asarray(gd.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(MinvR), np.asarray(gd.MinvR),
                               rtol=1e-6, atol=1e-8)
    assert int(flag) == 0


@pytest.mark.slow
def test_site_sharded_twisted_driver_matches_unsharded(tmp_path):
    """`--site-devices` on a twisted-BC config: full driver bin parity
    (HMC + sharded special updates + sharded complex measurement solves)."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["holstein"]["twist"] = [0.3, 0.15]
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"]["reflection_update"] = {"freq": 2, "nsites": 2}
    cfg["hmc"].pop("swap_update")
    cfg["lattice"]["L"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])


@pytest.mark.slow
def test_sharded_hmc_deflation_complex_matches_unsharded():
    """[solver.deflation] × complex hopping × --site-devices (the last
    open composition cell): the Hermitian CholeskyQR2 refresh and complex
    psum Grams reproduce the unsharded complex-deflated trajectory."""
    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_hmc_step

    D = 8
    assert jax.device_count() >= D
    spec, params, ops = _build_twisted()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10,
                    maxiter=3000, deflate_k=6, deflate_filter=4,
                    deflate_power=2)

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=None))
    sh_step = make_sharded_hmc_step(spec, plan, mesh, mass, cfg)

    key = jax.random.PRNGKey(7)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (spec.Nph, spec.Ltau))
    defl0 = init_deflation(ops, cfg, jax.random.PRNGKey(99), params=params)
    assert jnp.iscomplexobj(defl0.W)

    ref_state, ref_stats, _ = ref_step(
        params, HMCState(x=x, v=v, defl=defl0), key)
    xs, vs, stats, _, defl_s = sh_step(params, x, v, key, defl0)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)
    # same span: singular values of Wr·Ws† ≈ 1 (Hermitian principal angles)
    k = cfg.deflate_k
    Wr = np.asarray(ref_state.defl.W).reshape(k, -1)
    Ws = np.asarray(defl_s.W).reshape(k, -1)
    s = np.linalg.svd(Wr @ Ws.conj().T, compute_uv=False)
    assert s.min() > 0.99, s


# ---- twisted (complex-hopping) SSH under site sharding ---------------------
# The former NotImplementedError carve-out: the sharded per-(τ,bond)
# checkerboard/force closures run the same conj(s) Hermitian convention as
# the unsharded models/ssh.py path and are parity-tested here against it.


def _build_ssh_2d_twisted(L=8, Ltau=8, twist=(0.7, 0.3)):
    from elphdynamics_tpu.models import ssh as S

    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = S.build_ssh(
        lat, beta=Ltau * 0.1, dtau=0.1,
        hoppings=[dict(t=1.0, omega=1.0, alpha=0.4, alpha2=0.0,
                       o1=0, o2=0, dL=(1, 0, 0), name="phx"),
                  dict(t=1.0, omega=1.2, alpha=0.3, alpha2=0.1,
                       o1=0, o2=0, dL=(0, 1, 0), name="phy")],
        mu_assignments=[(-0.2, 0.0, None)],
        twist=twist,
        rng=np.random.default_rng(3),
    )
    assert params.t_phase is not None
    return spec, params


@pytest.mark.slow
def test_sharded_ssh_complex_matvecs_and_cg():
    """Twisted SSH fermion-matrix applies (complex per-(τ,bond) halo fold
    with conj(s) endpoints) + Re-Hermitian psum CG vs the unsharded complex
    operators."""
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_solver

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d_twisted()
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    solve, mulM_s, mulMT_s = make_sharded_ssh_solver(spec, plan, mesh)

    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    coeffs = S.ckb_coeffs(spec, params, x)
    co = (coeffs[0], coeffs[1])
    kv = jax.random.split(jax.random.PRNGKey(2))
    v = (jax.random.normal(kv[0], (spec.Nsites, spec.Ltau))
         + 1j * jax.random.normal(kv[1], (spec.Nsites, spec.Ltau)))

    ref_M = np.asarray(S.mulM(spec, params, coeffs, v))
    ref_MT = np.asarray(S.mulMT(spec, params, coeffs, v))
    np.testing.assert_allclose(np.asarray(mulM_s(params, co, v)), ref_M,
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(mulMT_s(params, co, v)), ref_MT,
                               atol=1e-11)
    # mulMT is the ADJOINT on the complex path: <Mu, v> = <u, M†v>
    u = (jax.random.normal(jax.random.PRNGKey(5), v.shape)
         + 1j * jax.random.normal(jax.random.PRNGKey(6), v.shape))
    lhs = complex(jnp.sum(jnp.conj(S.mulM(spec, params, coeffs, u)) * v))
    rhs_ = complex(jnp.sum(jnp.conj(u) * S.mulMT(spec, params, coeffs, v)))
    assert abs(lhs - rhs_) < 1e-8 * abs(lhs)

    sol, iters = jax.jit(lambda p, c, b: solve(p, c, b, tol=1e-9,
                                               maxiter=3000))(params, co, v)
    rhs = S.mulMT(spec, params, coeffs, v)
    r = S.mulMTM(spec, params, coeffs, sol) - rhs
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs))
    assert rel < 1e-8, (rel, int(iters))
    assert len(sol.sharding.device_set) == D


@pytest.mark.slow
@pytest.mark.parametrize("use_kpm", [False, True])
def test_sharded_ssh_complex_hmc_matches_unsharded(use_kpm):
    """FULL sharded twisted-SSH HMC (TRS pseudofermion packing, complex
    group-fold muldMdx with endpoint-placed phases, complex KPM) reproduces
    the unsharded make_hmc_step trajectory with the same key."""
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.parallel.lattice_shard import make_sharded_ssh_hmc_step

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d_twisted(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.3, Nb=1, tol=1e-10, maxiter=3000)
    kcfg = kpm.KPMConfig(max_order=16) if use_kpm else None
    precond = kpm.make_symmetric_precond(ops, kcfg) if use_kpm else None

    ref_step = jax.jit(make_hmc_step(ops, mass, cfg, precond=precond))
    sh_step = make_sharded_ssh_hmc_step(spec, plan, mesh, mass, cfg,
                                        kpm_cfg=kcfg)

    key = jax.random.PRNGKey(31)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(12), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)
    v = 0.1 * jax.random.normal(jax.random.PRNGKey(13), (spec.Nph, spec.Ltau))
    v = S.tie_fields(spec, v)

    ref_state, ref_stats, _ = ref_step(params, HMCState(x=x, v=v), key)
    xs, vs, stats, _ = sh_step(params, x, v, key)

    assert bool(stats["accepted"]) == bool(ref_stats.accepted)
    assert abs(float(stats["delta_H"]) - float(ref_stats.delta_H)) < 1e-5, (
        float(stats["delta_H"]), float(ref_stats.delta_H))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_state.x),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_ssh_complex_langevin_matches_unsharded():
    """Twisted-SSH Langevin under site sharding: circular complex trace
    probes, Re-Hermitian psum CG, complex group-fold force."""
    from elphdynamics_tpu.dynamics.langevin import make_langevin_step
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.ops.fourier_accel import build_Q
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_ssh_langevin_step)

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d_twisted(L=8, Ltau=8)
    ops = make_model_ops(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    Q = build_Q(np.asarray(params.omega), spec.dtau, spec.Ltau,
                [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    scfg = SolverConfig(tol=1e-10, maxiter=3000)

    ref_step = jax.jit(make_langevin_step(ops, Q, 0.01, "rk", scfg, None))
    sh_step = make_sharded_ssh_langevin_step(spec, plan, mesh, Q, 0.01, "rk",
                                             scfg)

    key = jax.random.PRNGKey(61)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(17), (spec.Nph, spec.Ltau))
    x = S.tie_fields(spec, x)

    x_ref, stats_ref, _ = ref_step(params, x, key)
    x_sh, stats_sh, _ = sh_step(params, x, key)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-7, atol=1e-9)
    assert int(stats_sh["flag"]) == 0


@pytest.mark.slow
def test_sharded_ssh_complex_greens_matches_unsharded():
    """Twisted-SSH estimator sampling: same circular complex probes (key
    parity) and tolerance-ball solutions as measure.greens.sample_greens."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig
    from elphdynamics_tpu.measure import greens as G
    from elphdynamics_tpu.models import ssh as S
    from elphdynamics_tpu.models.adapter import make_model_ops as mmo
    from elphdynamics_tpu.parallel.lattice_shard import (
        make_sharded_ssh_greens_sampler)

    D = 4
    assert jax.device_count() >= D
    spec, params = _build_ssh_2d_twisted()
    ops = mmo(spec)
    plan = build_shard_plan(spec.ckb, D)
    mesh = site_mesh(D)
    nv = 3
    scfg = SolverConfig(tol=1e-7, maxiter=3000)
    sampler = make_sharded_ssh_greens_sampler(spec, plan, mesh, nv, scfg)

    key = jax.random.PRNGKey(7)
    x = S.tie_fields(spec, 0.2 * jax.random.normal(
        jax.random.PRNGKey(8), (spec.Nph, spec.Ltau)))
    R, MinvR, iters, flag, key_out = sampler(params, x, key)
    gd, key_ref = G.sample_greens(ops, params, x, key, nv, scfg, None)
    assert jnp.iscomplexobj(R) and jnp.iscomplexobj(MinvR)
    np.testing.assert_allclose(np.asarray(R), np.asarray(gd.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(key_out), np.asarray(key_ref))
    assert int(flag) == 0
    np.testing.assert_allclose(np.asarray(MinvR), np.asarray(gd.MinvR),
                               atol=2e-5)
    assert len(MinvR.sharding.device_set) == D


@pytest.mark.slow
def test_site_sharded_twisted_ssh_driver_matches_unsharded(tmp_path):
    """`--site-devices` with TWISTED SSH ([ssh] twist — the former
    NotImplementedError carve-out): the production driver reproduces the
    single-device twisted run's measurement bins."""
    import copy
    import os

    from elphdynamics_tpu.simulation import simulate
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["lattice"]["L"] = 4  # 16 sites over 4 shards
    cfg.pop("holstein")
    cfg["ssh"] = {
        "beta": 1.0, "dtau": 0.1, "twist": [0.7, 0.3],
        "hopping": [{"t_avg": 1.0, "alpha_avg": 0.2, "omega_avg": 0.5,
                     "orbits": [1, 1], "dL": [1, 0, 0], "name": "x"},
                    {"t_avg": 1.0, "alpha_avg": 0.2, "omega_avg": 0.5,
                     "orbits": [1, 1], "dL": [0, 1, 0], "name": "y"}],
        "mu": [{"orbit": [1], "val": 0.0}],
    }
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"].pop("reflection_update")
    cfg["hmc"].pop("swap_update", None)
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, sd in (("one", 1), ("site", 4)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, site_devices=sd)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f8 = os.path.join(folders["site"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g8 = {l.split()[0]: float(l.split()[1]) for l in open(f8)}
        for k in g1:
            assert abs(g1[k] - g8[k]) < 1e-5 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g8[k])
