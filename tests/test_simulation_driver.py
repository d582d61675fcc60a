"""End-to-end driver test: run a tiny simulation from a config dict, check
the datafolder layout, the summary, and checkpoint/resume."""

import pytest

pytestmark = pytest.mark.slow

import copy
import os

import numpy as np

from elphdynamics_tpu.simulation import simulate, name_datafolder

BASE_CFG = {
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
        "omega4": [{"orbit": [1], "val": 0.0}],
    },
    "fourier_acceleration": [{"omega_min": 0.0, "omega_max": 10.0, "mass": 0.5}],
    "hmc": {
        "num_multitimesteps": 4, "burnin_updates": 4, "simulation_updates": 8,
        "trajectory_time": 0.4, "dt": 0.1, "meas_freq": 2,
        "momentum_conservation_fraction": 0.0, "log": True,
        "reflection_update": {"freq": 2, "nsites": 2},
        "swap_update": {"freq": 2, "nbonds": 2},
    },
    "simulation": {
        "filepath": ".", "foldername": "testrun", "num_bins": 2,
        "random_seed": 7, "write_M_matrix": True,
    },
    "solver": {
        "type": "CG", "tol": 1e-5, "maxiter": 2000,
        "preconditioner": {"n": 10, "buf": 0.05, "c1": 1.0, "c2": 1.0},
    },
    "measurements": {
        "num_random_vectors": 4,
        "Greens": {"measure": True, "time_dependent": True},
        "PhononGreens": {"measure": True, "time_dependent": True},
        "DenDen": {"measure": True, "time_dependent": True},
        "SpinSpin": {"measure": True, "time_dependent": False},
        "PairGreens": {"measure": True, "time_dependent": True},
        "Snapshots": {"density": True, "phonon_position": True},
    },
}


def test_simulate_end_to_end(tmp_path):
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    stats = simulate(cfg)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isdir(folder)
    # summary + stats
    assert os.path.isfile(os.path.join(folder, "testrun_summary.out"))
    txt = open(os.path.join(folder, "testrun_summary.out")).read()
    assert "Acceptance Rate" in txt and "density" in txt and "compressibility" in txt
    # reference summary sections (SimulationSummary.jl:55-140): input echo,
    # definitions, susceptibility/correlation aggregation
    for section in ("INPUT FILE CONTENTS", "BOND DEFINITIONS",
                    "PHONON DEFINITIONS", "CHEMICAL POTENTIALS",
                    "SIMULATION INFO", "GLOBAL MEASUREMENTS",
                    "ON-SITE MEASUREMENTS", "INTER-SITE MEASUREMENTS",
                    "SUSCEPTIBILITIES", "CORRELATIONS"):
        assert f"## {section} ##" in txt, section
    assert "[holstein]" in txt and "[[holstein.t]]" in txt  # TOML echo
    assert "Lambda_avg" in txt and "Mu_avg" in txt
    assert "[PairSusc_position]" in txt and "[Greens_momentum]" in txt
    # bins
    for b in (1, 2):
        assert os.path.isfile(os.path.join(
            folder, "global_measurements_f", f"global_measurements_{b:05d}.out"))
        assert os.path.isfile(os.path.join(
            folder, "Greens_position_f", f"Greens_position_{b:05d}.out"))
        assert os.path.isfile(os.path.join(
            folder, "Greens_momentum_f", f"Greens_momentum_{b:05d}.out"))
    # susceptibilities
    assert os.path.isfile(os.path.join(folder, "PairSusc_position_f",
                                       "PairSusc_position_00002.out"))
    assert os.path.isfile(os.path.join(folder, "ChargeSusc_position_stats.out"))
    # checkpoint, phonons, M matrix, snapshots, mu log
    assert os.path.isfile(os.path.join(folder, "checkpoint.npz"))
    assert os.path.isfile(os.path.join(folder, "final_phonon_config.out"))
    assert os.path.isfile(os.path.join(folder, "M_matrix.out"))
    assert os.path.isfile(os.path.join(folder, "density_snapshots_f",
                                       "density_snapshot_000004.out"))
    assert stats["acceptance_rate"] > 0.2
    # HMC energy log
    lines = open(os.path.join(folder, "hmc_sim_log.out")).readlines()
    assert lines[0].startswith("updates accepted") and len(lines) == 13
    # auto-increment naming: the existing (finished) folder has a checkpoint,
    # so the same name resolves to resume
    assert name_datafolder(str(tmp_path), "testrun") == folder
    # load_model round trip
    from elphdynamics_tpu.simulation import load_model
    setup2, params2, x2 = load_model(folder)
    assert x2.shape == (setup2.ops.Nph, setup2.ops.Ltau)
    assert np.all(np.isfinite(np.asarray(x2)))


def test_simulate_multichain(tmp_path):
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 1
    stats = simulate(cfg, n_chains=3)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(folder, "testrun_summary.out"))
    assert 0.0 <= stats["acceptance_rate"] <= 1.0


def test_checkpoint_resume_continues(tmp_path):
    """Interrupt after the first bin (simulated by a partial-run config),
    then resume: the second run must pick up at the stored counters and
    produce the remaining bins."""
    import elphdynamics_tpu.simulation as sim_mod
    from elphdynamics_tpu.io import checkpoint as ckpt_mod

    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    folder = os.path.join(str(tmp_path), "testrun-7")

    # run once fully to produce a checkpoint mid-state: emulate an interrupted
    # run by running with fewer steps first, then hand-editing the counters
    stats = simulate(cfg, run_id=7)
    st = ckpt_mod.load_checkpoint(folder)
    assert st["counters"]["sim_start"] == cfg["hmc"]["simulation_updates"]
    # rewind to mid-run and resume: must complete without error and rewrite bin 2
    st["counters"]["sim_start"] = 4
    ckpt_mod.save_checkpoint(
        folder, x=st["x"], v=st["v"], key=st["key"],
        params=type(sim_mod.build_setup(cfg, folder).params)(
            **{k: st["params"].get(k) for k in st["params"]}),
        container=st["container"], counters=st["counters"],
        sim_stats=st["sim_stats"], mu_tuner_state=st["mu_tuner"])
    before = os.path.getmtime(os.path.join(
        folder, "global_measurements_f", "global_measurements_00002.out"))
    simulate(cfg, run_id=7)
    after = os.path.getmtime(os.path.join(
        folder, "global_measurements_f", "global_measurements_00002.out"))
    assert after >= before


def test_simulate_langevin_and_mutuner(tmp_path):
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg.pop("hmc")
    cfg["langevin"] = {
        "burnin_timesteps": 4, "simulation_timesteps": 8, "meas_freq": 2,
        "dt": 0.01, "update_method": 2,
    }
    cfg["tune_density"] = {"density": 1.0, "memory": 0.5, "kappa_min": 0.1}
    stats = simulate(cfg)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(folder, "mu_tuner_log.out"))
    lines = open(os.path.join(folder, "mu_tuner_log.out")).readlines()
    assert len(lines) > 2


def test_simulate_ssh_driver(tmp_path):
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["lattice"]["L"] = 3  # avoid bond dedup (one phonon per cell per type)
    cfg.pop("holstein")
    cfg["ssh"] = {
        "beta": 1.0, "dtau": 0.1,
        "hopping": [{"t_avg": 1.0, "alpha_avg": 0.2, "omega_avg": 0.5,
                     "orbits": [1, 1], "dL": [1, 0, 0], "name": "x"}],
        "mu": [{"orbit": [1], "val": 0.0}],
    }
    cfg["hmc"].pop("reflection_update")
    cfg["simulation"]["write_M_matrix"] = False
    stats = simulate(cfg)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(folder, "testrun_summary.out"))
    txt = open(os.path.join(folder, "testrun_summary.out")).read()
    assert "el_ke" in txt and "sign_switch" in txt


def test_solver_failures_logged_and_masked(tmp_path):
    """Forced solver failures (maxiter=2) must be logged into the run log,
    counted in sim_stats/summary, auto-reject every HMC update, and still
    produce finite (unbiased fallback) measurement bins (VERDICT r1 weak #3)."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["solver"]["maxiter"] = 2
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"].pop("reflection_update")
    cfg["hmc"].pop("swap_update")
    cfg["simulation"]["num_bins"] = 1
    cfg["simulation"]["write_M_matrix"] = False
    stats = simulate(cfg, n_chains=2)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert stats.get("solver_failures", 0) > 0
    assert stats["acceptance_rate"] == 0.0  # trajectory abort auto-rejects
    log = open(os.path.join(folder, "testrun.log")).read()
    assert "solver failure" in log
    txt = open(os.path.join(folder, "testrun_summary.out")).read()
    assert "Solver Failures" in txt
    # bins were still written and are finite
    vals = []
    with open(os.path.join(folder, "global_measurements_f",
                           "global_measurements_00001.out")) as f:
        for line in f:
            vals.append(float(line.split()[-1]))
    assert vals and all(np.isfinite(v) for v in vals)


def test_async_stats_match_sync_and_aggregate_failures(tmp_path):
    """With [hmc] log off the driver defers per-update statistics into
    device-side accumulators (async dispatch pipeline, simulation.py
    flush_stats). The deferred accounting must reproduce the synchronous
    path's counters exactly (the dynamics are identical either way), and
    forced solver failures must still reach the run log (as an aggregated
    per-window warning) and the summary."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path / "sync")
    cfg["solver"]["maxiter"] = 2
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 1
    cfg["simulation"]["write_M_matrix"] = False
    os.makedirs(str(tmp_path / "sync"))
    stats_sync = simulate(cfg, n_chains=2)

    cfg2 = copy.deepcopy(cfg)
    cfg2["simulation"]["filepath"] = str(tmp_path / "async")
    cfg2["hmc"]["log"] = False
    os.makedirs(str(tmp_path / "async"))
    stats_async = simulate(cfg2, n_chains=2)

    for k in ("acceptance_rate", "iters", "reflect_acceptance_rate",
              "swap_acceptance_rate"):
        assert abs(stats_sync[k] - stats_async[k]) < 1e-5, (
            k, stats_sync[k], stats_async[k])
    assert stats_async.get("solver_failures", 0) == \
        stats_sync.get("solver_failures", 0) > 0
    log = open(os.path.join(str(tmp_path / "async"), "testrun-1",
                            "testrun.log")).read()
    assert "solver failure" in log
    txt = open(os.path.join(str(tmp_path / "async"), "testrun-1",
                            "testrun_summary.out")).read()
    assert "Solver Failures" in txt


def test_simulate_honeycomb_multiorbital(tmp_path):
    """Multi-orbital (norbits=2, honeycomb) driver run: per-orbit parameter
    assignment, orbit-indexed onsite measurements, and multi-orbital
    correlation tensors all flow through the datafolder IO
    (examples/holstein_hmc_honeycomb.toml geometry)."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["lattice"] = {
        "ndim": 2, "norbits": 2,
        "lattice_vectors": [[1.5, -0.8660254], [1.5, 0.8660254]],
        "basis_vectors": [[0.0, 0.0], [1.0, 0.0]],
        "L": 2,
    }
    cfg["holstein"]["t"] = [
        {"val": 1.0, "orbit": [1, 2], "dL": [0, 0, 0]},
        {"val": 1.0, "orbit": [1, 2], "dL": [-1, 0, 0]},
        {"val": 1.0, "orbit": [1, 2], "dL": [0, -1, 0]},
    ]
    for key in ("omega", "lambda", "mu", "omega4"):
        for d in cfg["holstein"][key]:
            d["orbit"] = [1, 2]
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["hmc"].pop("reflection_update")
    cfg["hmc"].pop("swap_update")
    cfg["simulation"]["num_bins"] = 1
    cfg["simulation"]["write_M_matrix"] = False
    stats = simulate(cfg, n_chains=2)
    folder = os.path.join(str(tmp_path), "testrun-1")
    # onsite file carries both orbits
    lines = open(os.path.join(
        folder, "onsite_measurements_f", "onsite_measurements_00001.out")
    ).read().splitlines()
    dens = [l for l in lines if l.startswith("density ")]
    assert len(dens) == 2 and all(np.isfinite(float(l.split()[-1])) for l in dens)
    # correlation tensors carry the full (o1, o2) pair axis — the reference's
    # (2L, nₒ, nₒ, L1, L2, L3) layout (GreensFunctions.jl:239-288)
    corr = np.loadtxt(os.path.join(
        folder, "Greens_position_f", "Greens_position_00001.out"), skiprows=1)
    Lt = 10 + 1  # time_dependent: tau = 0..Ltau
    assert corr.shape[0] == (2 * 2) * 2 * 2 * 1 * Lt
    assert np.all(np.isfinite(corr))
    assert 0.0 <= stats["acceptance_rate"] <= 1.0


def test_key_files_written(tmp_path):
    """*_key.out index files (Measurements.jl:385-540): one label row per
    flattened bin-file row, same ordering."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 2
    cfg["hmc"].pop("reflection_update")
    cfg["hmc"].pop("swap_update")
    cfg["simulation"]["num_bins"] = 1
    cfg["simulation"]["write_M_matrix"] = False
    simulate(cfg)
    folder = os.path.join(str(tmp_path), "testrun-1")
    key = np.loadtxt(os.path.join(folder, "Greens_position_f",
                                  "Greens_position_key.out"), skiprows=1)
    bin1 = np.loadtxt(os.path.join(folder, "Greens_position_f",
                                   "Greens_position_00001.out"), skiprows=1)
    assert key.shape[0] == bin1.shape[0]
    assert key[0].tolist() == [1, 1, 1, 0, 0, 0, 0]
    assert key[1].tolist() == [2, 1, 1, 0, 0, 0, 1]  # tau fastest
    skey = np.loadtxt(os.path.join(folder, "PairSusc_position_f",
                                   "PairSusc_position_key.out"), skiprows=1)
    sbin = np.loadtxt(os.path.join(folder, "PairSusc_position_f",
                                   "PairSusc_position_00001.out"), skiprows=1)
    assert skey.shape[0] == sbin.shape[0]


def test_auto_chains_matches_measured_peaks():
    """--chains 0: the heuristic reproduces the measured throughput peaks
    (BASELINE.md scaling + beta tables)."""
    from elphdynamics_tpu.simulation import auto_chains

    assert auto_chains(64, 40) == 128          # 8×8 β=4 Holstein
    assert auto_chains(256, 40) == 64          # 16×16
    assert auto_chains(1024, 40) == 32         # 32×32
    assert auto_chains(4096, 40) == 16         # 64×64
    assert auto_chains(64, 160) == 32          # 8×8 β=16 (∝ 1/Lτ)
    assert auto_chains(64, 40, is_holstein=False) == 64   # SSH 8×8
    assert auto_chains(256, 40, is_holstein=False) == 32  # SSH 16×16
    assert auto_chains(64, 40, n_devices=4) == 512        # same per chip
    assert auto_chains(10 ** 6, 400) == 1                 # floor


def test_simulate_twisted_boundary_conditions(tmp_path):
    """[holstein] twist end-to-end: complex TRS ensemble through the full
    driver (HMC + special updates + measurements + summary); the KPM
    preconditioner is gated off with a warning, correlation stats come out
    real-finite, and the M-matrix dump carries genuine imaginary parts."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["simulation"]["foldername"] = "twistrun"
    cfg["holstein"]["twist"] = [1.2, 0.7]
    stats = simulate(cfg)
    folder = os.path.join(str(tmp_path), "twistrun-1")
    assert stats["acceptance_rate"] > 0.5
    txt = open(os.path.join(folder, "twistrun_summary.out")).read()
    # the twist multiplies bonds by Peierls phases, so t is complex and the
    # bond definitions report the imaginary part
    assert "t_imag_avg" in txt
    assert "Acceptance Rate" in txt
    # stats equal the mean over the DATA bins only (regression: the key file
    # must not be averaged in — its integer coordinates once biased every row)
    import numpy as _np
    rows = []
    for b in (1, 2):
        d = _np.loadtxt(os.path.join(folder, "Greens_position_f",
                                     f"Greens_position_{b:05d}.out"),
                        skiprows=1)
        rows.append(d[:, 1])
    st = _np.loadtxt(os.path.join(folder, "Greens_position_stats.out"),
                     skiprows=1)
    _np.testing.assert_allclose(st[:, 1], _np.mean(rows, axis=0), atol=1e-6)
    # complex M: imag column of the dump is genuinely nonzero
    m = _np.loadtxt(os.path.join(folder, "M_matrix.out"), skiprows=1)
    assert _np.max(_np.abs(m[:, 3])) > 1e-3


def test_simulate_nearnull_precond(tmp_path):
    """[solver.nearnull] drives the two-level preconditioner through the
    full driver (setup per update, per-solve smooth refresh)."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 2
    cfg["solver"]["nearnull"] = {"k": 4, "setup_iters": 3, "setup_passes": 1,
                                 "refresh_iters": 2}
    stats = simulate(cfg, n_chains=2)
    folder = os.path.join(str(tmp_path), "testrun-1")
    assert os.path.isfile(os.path.join(folder, "testrun_summary.out"))
    assert 0.0 < stats["acceptance_rate"] <= 1.0


@pytest.mark.slow
def test_simulate_twisted_with_deflation(tmp_path):
    """[solver.deflation] × [holstein] twist through the full driver (the
    former NotImplementedError carve-out): complex-Hermitian basis, runs
    flag-free, acceptance healthy, finite stats."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["simulation"]["foldername"] = "twistdefl"
    cfg["holstein"]["twist"] = [1.2, 0.7]
    cfg["solver"]["deflation"] = {"k": 4, "filter_degree": 4,
                                  "power_iters": 2}
    stats = simulate(cfg)
    assert stats["acceptance_rate"] > 0.5
    folder = os.path.join(str(tmp_path), "twistdefl-1")
    txt = open(os.path.join(folder, "twistdefl_summary.out")).read()
    assert "Acceptance Rate" in txt


@pytest.mark.slow
def test_resume_completed_run_keeps_stats(tmp_path):
    """Resuming a run whose checkpoint says everything is done must report
    the same final rates, not re-normalize them (regression: the final
    checkpoint once stored post-division rates, so a no-op resume divided
    acceptance and iters by the update count a second time)."""
    cfg = copy.deepcopy(BASE_CFG)
    cfg["simulation"]["filepath"] = str(tmp_path)
    cfg["hmc"]["burnin_updates"] = 2
    cfg["hmc"]["simulation_updates"] = 4
    cfg["simulation"]["num_bins"] = 2
    stats1 = simulate(cfg, run_id=11)
    stats2 = simulate(cfg, run_id=11)  # resume: nothing left to run
    assert stats2["acceptance_rate"] == pytest.approx(
        stats1["acceptance_rate"], abs=1e-9)
    assert stats2["iters"] == pytest.approx(stats1["iters"], abs=1e-9)
