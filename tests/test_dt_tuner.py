"""Burnin dt auto-tuning ([hmc] tune_dt — beyond reference scope; the
reference's dt is a hand-set constant, HMC.jl:26).

Unit tier: the dual-averaging recursion (Hoffman & Gelman 2014 §3.2)
converges to the target acceptance on a synthetic acceptance curve.
Slow tier: the full driver tunes a deliberately too-small dt UP during
burnin, freezes it into the sampling phase, records it in sim_stats, and
survives a checkpoint/resume across the burnin boundary.
"""

import copy
import os

import numpy as np
import pytest

from elphdynamics_tpu.dynamics.hmc import dt_tuner_init, dt_tuner_update


def test_dual_averaging_converges_to_target():
    # synthetic leapfrog-like acceptance: a(dt) = exp(-(dt/0.3)^2)
    def a_of(dt):
        return float(np.exp(-((dt / 0.3) ** 2)))

    t = dt_tuner_init(0.01)
    for _ in range(300):
        t = dt_tuner_update(t, a_of(float(np.exp(t.log_dt))), 0.8)
    dt_star = float(np.exp(t.log_dt_avg))
    assert abs(a_of(dt_star) - 0.8) < 0.05
    # from 0.01 the tuner had to raise dt by an order of magnitude
    assert dt_star > 0.08


def test_dual_averaging_respects_clamp():
    t = dt_tuner_init(0.1, lo=0.05, hi=0.4)
    for _ in range(100):
        t = dt_tuner_update(t, 1.0, 0.8)  # always-accept pushes dt up
    assert float(np.exp(t.log_dt)) <= 0.4 + 1e-6
    for _ in range(200):
        t = dt_tuner_update(t, 0.0, 0.8)  # always-reject pushes dt down
    assert float(np.exp(t.log_dt)) >= 0.05 - 1e-6


TUNE_CFG = {
    "lattice": {
        "ndim": 2, "norbits": 1,
        "lattice_vectors": [[1.0, 0.0], [0.0, 1.0]],
        "basis_vectors": [[0.0, 0.0]],
        "L": 2,
    },
    "holstein": {
        "beta": 1.0, "dtau": 0.1,
        "t": [{"val": 1.0, "orbit": [1, 1], "dL": [1, 0, 0]},
              {"val": 1.0, "orbit": [1, 1], "dL": [0, 1, 0]}],
        "omega": [{"orbit": [1], "val": 1.0}],
        "lambda": [{"orbit": [1], "val": 0.8}],
        "mu": [{"orbit": [1], "val": 0.0}],
    },
    "fourier_acceleration": [
        {"omega_min": 0.0, "omega_max": 10.0, "mass": 0.5}],
    "hmc": {
        # deliberately over-resolved: dt=0.01 gives acceptance ~1, far
        # above the 0.9 target, so the tuner must raise dt substantially
        "burnin_updates": 40, "simulation_updates": 8,
        "trajectory_time": 0.1, "dt": 0.01, "meas_freq": 2, "log": True,
        "tune_dt": True, "target_acceptance": 0.9,
    },
    "simulation": {
        "foldername": "tuned", "num_bins": 2, "random_seed": 11,
        "checkpoint_freq": 10,
    },
    "solver": {
        "type": "CG", "tol": 1e-5, "maxiter": 2000,
        "preconditioner": {"n": 10, "buf": 0.05, "c1": 1.0, "c2": 1.0},
    },
    "measurements": {
        "num_random_vectors": 4,
        "Greens": {"measure": True, "time_dependent": False},
    },
}


@pytest.mark.slow
def test_tune_dt_end_to_end(tmp_path):
    from elphdynamics_tpu.simulation import simulate

    cfg = copy.deepcopy(TUNE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    stats = simulate(cfg, n_chains=2)

    assert "tuned_dt" in stats
    tuned = stats["tuned_dt"]
    # raised from 0.01 by at least 3x, and clamped below the 64x rail
    assert 0.03 < tuned < 0.64
    # the tuned sampling phase keeps a healthy acceptance: the tuner
    # targeted 0.9 at fixed Nt=10; the frozen phase re-derives Nt from
    # trajectory_time, so only sanity (not equality) is asserted
    assert stats["acceptance_rate"] > 0.5
    folder = os.path.join(str(tmp_path), "tuned-1")
    log = open(os.path.join(folder, "tuned.log")).read()
    assert "tune_dt: frozen dt=" in log


@pytest.mark.slow
def test_tune_dt_resume_post_burnin(tmp_path):
    """Resume after burnin must re-freeze the persisted tuned dt (not the
    configured one)."""
    from elphdynamics_tpu.io import checkpoint as ckpt
    from elphdynamics_tpu.simulation import simulate

    cfg = copy.deepcopy(TUNE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 20
    cfg["hmc"]["simulation_updates"] = 4
    stats = simulate(cfg, n_chains=2)
    folder = os.path.join(str(tmp_path), "tuned-1")
    tuned = stats["tuned_dt"]

    # rewind the checkpoint to mid-sampling and resume in the same folder
    st = ckpt.load_checkpoint(folder)
    st["counters"]["sim_start"] = 2
    ckpt.save_checkpoint(
        folder, x=st["x"], v=st["v"], key=st["key"],
        params=type("P", (), {"_asdict": lambda self: st["params"]})(),
        container=st["container"], counters=st["counters"],
        sim_stats=st["sim_stats"], mu_tuner_state=st["mu_tuner"],
        extras=st["extras"])
    # same foldername: tuned-1 exists WITH a checkpoint → resume in place
    stats2 = simulate(copy.deepcopy(cfg), n_chains=2)
    assert stats2["tuned_dt"] == pytest.approx(tuned)
    log = open(os.path.join(folder, "tuned.log")).read()
    assert log.count("tune_dt: frozen dt=") >= 2
