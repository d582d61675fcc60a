"""Post-run summary: aggregate bin files into mean ± stderr reports.

Reference: SimulationSummary.jl. After a run, every per-bin output file is
re-read, re-binned into ≤10 bins, and written as ``mean ± error`` into
``*_stats.out`` files plus a human-readable ``<foldername>_summary.out``
(config echo, timing and acceptance stats, global/onsite/intersite
averages; :23-140,312-902).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def mean_and_error(bins: np.ndarray):
    """Mean and standard error over bin values, re-binned to ≤10 bins
    (SimulationSummary.jl:885-902)."""
    bins = np.asarray(bins)
    n = bins.shape[0]
    if n == 0:
        return 0.0, 0.0
    nb = min(10, n)
    m = (n // nb) * nb
    rebinned = bins[:m].reshape(nb, -1, *bins.shape[1:]).mean(axis=1)
    mean = rebinned.mean(axis=0)
    err = rebinned.std(axis=0, ddof=1) / np.sqrt(nb) if nb > 1 else np.zeros_like(mean)
    return mean, err


def _read_keyed_bins(folder, prefix):
    """Read per-bin 'key value' files -> {key: [values per bin]}."""
    vals = defaultdict(list)
    if not os.path.isdir(folder):
        return vals
    for fname in sorted(os.listdir(folder)):
        if not fname.startswith(prefix):
            continue
        with open(os.path.join(folder, fname)) as f:
            first = f.readline()
            lines = [first] if " " in first and not any(
                h in first for h in ("measurement", "index")) else []
            lines += f.readlines()
            for line in lines:
                parts = line.split()
                if len(parts) >= 2:
                    key = " ".join(parts[:-1])
                    try:
                        vals[key].append(float(parts[-1]))
                    except ValueError:
                        pass
    return vals


def _read_indexed_bins(folder, prefix):
    """Read per-bin correlation files -> array [nbins, nindex, 2]."""
    bins = []
    if not os.path.isdir(folder):
        return None
    for fname in sorted(os.listdir(folder)):
        if not fname.startswith(prefix) or not fname.endswith(".out"):
            continue
        data = []
        with open(os.path.join(folder, fname)) as f:
            f.readline()
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    data.append((float(parts[1]), float(parts[2])))
        if data:
            bins.append(data)
    return np.asarray(bins) if bins else None


def write_summary(setup, sim_stats: dict, mu_tuner) -> str:
    """Aggregate all bins and write the summary + stats files."""
    sp = setup.sim_params
    datafolder = sp.datafolder
    summary_path = os.path.join(datafolder, f"{sp.foldername}_summary.out")

    with open(summary_path, "w") as f:
        f.write("#########################\n## SIMULATION SUMMARY ##\n#########################\n\n")
        f.write("[simulation parameters]\n")
        for k in ("burnin", "nsteps", "meas_freq", "num_bins", "bin_size", "random_seed"):
            f.write(f"{k} = {getattr(sp, k)}\n")
        f.write("\n[timing / acceptance]\n")
        f.write(f"simulation_time_minutes = {sim_stats['simulation_time'] / 60.0:.6f}\n")
        f.write(f"measurement_time_minutes = {sim_stats['measurement_time'] / 60.0:.6f}\n")
        f.write(f"write_time_minutes = {sim_stats['write_time'] / 60.0:.6f}\n")
        f.write(f"iterative_solver_steps = {sim_stats['iters']:.4f}\n")
        f.write(f"acceptance_rate = {sim_stats['acceptance_rate']:.6f}\n")
        f.write(f"reflect_acceptance_rate = {sim_stats['reflect_acceptance_rate']:.6f}\n")
        f.write(f"swap_acceptance_rate = {sim_stats['swap_acceptance_rate']:.6f}\n")
        if mu_tuner is not None and mu_tuner.active:
            f.write(f"tuned_mu = {mu_tuner.mu_avg:.8f} +- {mu_tuner.mu_err:.8f}\n")

        # global measurements (+ compressibility, Measurements.jl:1323-1344)
        gvals = _read_keyed_bins(os.path.join(datafolder, "global_measurements_f"),
                                 "global_measurements")
        f.write("\n[global measurements]\n")
        stats = {}
        for k, v in sorted(gvals.items()):
            mean, err = mean_and_error(np.asarray(v))
            stats[k] = (mean, err)
            f.write(f"{k} = {mean:.8f} +- {err:.8f}\n")
        if "density" in stats and "Nsqr" in stats:
            beta = setup.ops.beta
            N = setup.ops.Nsites
            n_mean, n_err = stats["density"]
            N2_mean, N2_err = stats["Nsqr"]
            Nbar = N * n_mean
            dNbar = N * n_err
            kappa = beta * (N2_mean - Nbar ** 2) / N
            dkappa = beta * np.sqrt(N2_err ** 2 + (2 * Nbar * dNbar) ** 2) / N
            f.write(f"compressibility = {kappa:.8f} +- {dkappa:.8f}\n")

        for group, label in (("onsite_measurements", "on-site measurements"),
                             ("intersite_measurements", "inter-site measurements")):
            vals = _read_keyed_bins(os.path.join(datafolder, f"{group}_f"), group)
            f.write(f"\n[{label}]\n")
            for k, v in sorted(vals.items()):
                mean, err = mean_and_error(np.asarray(v))
                f.write(f"{k} = {mean:.8f} +- {err:.8f}\n")

    # per-correlation stats files (SimulationSummary.jl:312-880)
    for entry in sorted(os.listdir(datafolder)):
        if not entry.endswith("_f") or not os.path.isdir(os.path.join(datafolder, entry)):
            continue
        name = entry[:-2]
        if name in ("global_measurements", "onsite_measurements",
                    "intersite_measurements") or name.endswith("snapshots"):
            continue
        bins = _read_indexed_bins(os.path.join(datafolder, entry), name)
        if bins is None:
            continue
        mean, err = mean_and_error(bins)
        with open(os.path.join(datafolder, f"{name}_stats.out"), "w") as f:
            f.write(f"index {name}_mean_real {name}_mean_imag {name}_err_real {name}_err_imag\n")
            for i in range(mean.shape[0]):
                f.write(f"{i + 1} {mean[i, 0]:.8f} {mean[i, 1]:.8f} "
                        f"{err[i, 0]:.8f} {err[i, 1]:.8f}\n")

    return summary_path
