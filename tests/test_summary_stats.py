"""Unit tests for the summary statistics bin readers (io/summary.py).

Regression: the coordinate-key companion file (``<name>_key.out``) must NOT
be parsed as a data bin — it silently averaged integer coordinates into
every correlation mean/err (found via a constant 1/3 imag column at
num_bins = 2)."""

import numpy as np

from elphdynamics_tpu.io.summary import (_read_indexed_bins, _read_keyed_bins,
                                         mean_and_error)


def _write(folder, name, rows):
    with open(folder / name, "w") as f:
        f.write("index corr_real corr_imag\n")
        for i, (re, im) in enumerate(rows):
            f.write(f"{i + 1} {re:.8f} {im:.8f}\n")


def test_read_indexed_bins_skips_key_file(tmp_path):
    _write(tmp_path, "Greens_position_00001.out", [(0.4, 0.0), (0.2, 0.1)])
    _write(tmp_path, "Greens_position_00002.out", [(0.6, 0.0), (0.4, -0.1)])
    with open(tmp_path / "Greens_position_key.out", "w") as f:
        f.write("index orbit1 orbit2 r3 r2 r1 tau\n1 1 1 0 0 0 0\n2 1 1 0 0 0 1\n")
    bins = _read_indexed_bins(str(tmp_path), "Greens_position")
    assert bins.shape == (2, 2, 2)          # [nbins, nindex, (re, im)]
    mean, err = mean_and_error(bins)
    np.testing.assert_allclose(mean[:, 0], [0.5, 0.3], atol=1e-12)
    np.testing.assert_allclose(mean[:, 1], [0.0, 0.0], atol=1e-12)


def test_read_keyed_bins_ignores_headers(tmp_path):
    for b, v in ((1, 1.0), (2, 3.0)):
        with open(tmp_path / f"global_measurements_{b:05d}.out", "w") as f:
            f.write("measurement value\ndensity 0.5\n")
            f.write(f"Nsqr {v}\n")
    vals = _read_keyed_bins(str(tmp_path), "global_measurements")
    np.testing.assert_allclose(vals["Nsqr"], [1.0, 3.0])
    np.testing.assert_allclose(vals["density"], [0.5, 0.5])
