"""Chain-sharded mesh execution through the PRODUCTION driver.

The reference's entire parallelism story is N independent processes
(ElPhDynamics.jl:90-95,166-186); here the same chains run as one SPMD
program over a ``jax.sharding.Mesh``. These tests run on the 8 virtual CPU
devices provisioned by conftest and assert that sharding the chains over
the mesh leaves the physics identical to single-device vmap execution —
per-bin measurement files agree to reduction-order rounding.
"""

import pytest

pytestmark = pytest.mark.slow

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.simulation import simulate
from test_simulation_driver import BASE_CFG


def _read_global(folder, b):
    path = os.path.join(folder, "global_measurements_f",
                        f"global_measurements_{b:05d}.out")
    out = {}
    with open(path) as f:
        for line in f:
            k, v = line.split()
            out[k] = float(v)
    return out


def _read_corr(folder, name, b):
    path = os.path.join(folder, f"{name}_f", f"{name}_{b:05d}.out")
    return np.loadtxt(path, skiprows=1)


def test_sharded_driver_matches_vmap(tmp_path):
    assert jax.device_count() >= 8, "conftest must provision 8 virtual devices"
    cfg = copy.deepcopy(BASE_CFG)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False

    folders = {}
    for sub, ndev in (("vmap", 1), ("mesh", 8)):
        cfg["simulation"]["filepath"] = str(tmp_path / sub)
        os.makedirs(str(tmp_path / sub), exist_ok=True)
        stats = simulate(cfg, n_chains=8, n_devices=ndev)
        assert 0.0 <= stats["acceptance_rate"] <= 1.0
        folders[sub] = os.path.join(str(tmp_path / sub), "testrun-1")

    for b in (1, 2):
        g1 = _read_global(folders["vmap"], b)
        g8 = _read_global(folders["mesh"], b)
        assert set(g1) == set(g8)
        for k in g1:
            assert abs(g1[k] - g8[k]) < 5e-7, (b, k, g1[k], g8[k])
        for name in ("Greens_position", "DenDen_momentum", "PairSusc_position"):
            c1 = _read_corr(folders["vmap"], name, b)
            c8 = _read_corr(folders["mesh"], name, b)
            np.testing.assert_allclose(c1, c8, atol=5e-7, err_msg=f"{name} bin {b}")

    # sharded checkpoint must round-trip (gathered to host as full arrays)
    from elphdynamics_tpu.io import checkpoint as ckpt
    st = ckpt.load_checkpoint(folders["mesh"])
    assert st["x"].shape[0] == 8 and np.all(np.isfinite(st["x"]))


def test_sharded_step_is_actually_distributed():
    """The jitted sharded step must place per-chain state on distinct devices."""
    from elphdynamics_tpu.parallel.chains import (
        chain_mesh, make_sharded_chain_step, shard_chain_tree)
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = build_holstein(
        lat, beta=0.8, dtau=0.1, t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.5, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=1.0)])
    cfg = HMCConfig(dt=0.1, trajectory_time=0.2, tol=1e-6, maxiter=500)
    step = make_hmc_step(ops, mass, cfg)

    mesh = chain_mesh(8)
    sstep = make_sharded_chain_step(mesh, step)
    keys = shard_chain_tree(mesh, jax.random.split(jax.random.PRNGKey(0), 8))
    x = shard_chain_tree(mesh, jnp.zeros((8, spec.Nph, spec.Ltau)))
    states = HMCState(x=x, v=jnp.zeros_like(x))
    new_states, stats, keys = sstep(params, states, keys)
    jax.block_until_ready(new_states.x)
    # output stays sharded over all 8 devices
    assert len(new_states.x.sharding.device_set) == 8
    # and matches plain vmap execution bit-for-bit per chain
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))
    ref_states, ref_stats, _ = vstep(
        params, HMCState(x=jnp.zeros((8, spec.Nph, spec.Ltau)),
                         v=jnp.zeros((8, spec.Nph, spec.Ltau))),
        jax.random.split(jax.random.PRNGKey(0), 8))
    np.testing.assert_allclose(np.asarray(new_states.x), np.asarray(ref_states.x),
                               atol=1e-12)


def test_sharded_checkpoint_resume(tmp_path):
    """Resume a run with chains sharded over the mesh: the restored state is
    re-placed onto the mesh and the remaining bins are reproduced."""
    import copy

    from elphdynamics_tpu.io import checkpoint as ckpt
    from elphdynamics_tpu.io.config import build_setup

    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["simulation"]["write_M_matrix"] = False
    simulate(cfg, run_id=3, n_chains=8, n_devices=8)
    folder = os.path.join(str(tmp_path), "testrun-3")

    st = ckpt.load_checkpoint(folder)
    assert st["counters"]["sim_start"] == 4
    st["counters"]["sim_start"] = 2  # rewind into the middle of bin 2
    # checkpointed sim_stats are RAW accumulating counters consistent with
    # (burnin_start, sim_start) — rewinding the counter alone would make the
    # resume double-count the replayed window, so scale the per-update sums
    # down to the rewound coverage (4 of 6 updates)
    for k in ("iters", "acceptance_rate", "reflect_acceptance_rate",
              "swap_acceptance_rate"):
        if k in st["sim_stats"]:
            st["sim_stats"][k] *= 4.0 / 6.0
    setup = build_setup(cfg, folder)
    ckpt.save_checkpoint(
        folder, x=st["x"], v=st["v"], key=st["key"],
        params=type(setup.params)(**{k: st["params"].get(k)
                                     for k in st["params"]}),
        container=st["container"], counters=st["counters"],
        sim_stats=st["sim_stats"], mu_tuner_state=st["mu_tuner"])
    stats = simulate(cfg, run_id=3, n_chains=8, n_devices=8)
    assert os.path.isfile(os.path.join(
        folder, "global_measurements_f", "global_measurements_00002.out"))
    assert 0.0 <= stats["acceptance_rate"] <= 1.0
