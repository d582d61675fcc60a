"""Native C++ host preprocessing vs the pure-Python reference paths."""

import os

import numpy as np
import pytest

from elphdynamics_tpu import native
from elphdynamics_tpu.lattice import Lattice, UnitCell, sort_neighbor_table
from elphdynamics_tpu.ops import checkerboard as C


def _python_groups(table):
    """The pure-Python greedy (bypass the native dispatch)."""
    os.environ["ELPHDYN_NO_NATIVE"] = "1"
    try:
        import importlib
        importlib.reload(native)
        return C.checkerboard_groups(table)
    finally:
        os.environ.pop("ELPHDYN_NO_NATIVE")
        import importlib
        importlib.reload(native)


def make_table(L=6):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    t = np.concatenate([lat.calc_neighbor_table(0, 0, (1, 0, 0)),
                        lat.calc_neighbor_table(0, 0, (0, 1, 0)),
                        lat.calc_neighbor_table(0, 0, (1, 1, 0))], axis=1)
    table, _ = sort_neighbor_table(t)
    return lat, table


def test_native_available():
    assert native._load() is not None, "g++ toolchain expected in this image"


def test_groups_native_matches_python():
    lat, table = make_table()
    want = _python_groups(table)
    got = native.checkerboard_groups(table)
    assert got is not None
    assert np.array_equal(got, want)


def test_dense_native_matches_python():
    lat, table = make_table()
    spec = C.build_checkerboard_spec(lat.nsites, table)
    rng = np.random.default_rng(0)
    t = 1.0 + 0.1 * rng.standard_normal(spec.nbonds)
    c, s = np.cosh(0.1 * t), np.sinh(0.1 * t)
    for inv in (False, True):
        got = native.dense_matrix(spec.neighbor_table, spec.nsites, c, s, inverse=inv)
        # python reference assembly
        D = np.eye(spec.nsites)
        order = range(spec.nbonds) if not inv else range(spec.nbonds - 1, -1, -1)
        sgn = -1.0 if inv else 1.0
        for n in order:
            i, j = spec.neighbor_table[:, n]
            ri, rj = D[i].copy(), D[j].copy()
            D[i] = c[n] * ri + sgn * s[n] * rj
            D[j] = c[n] * rj + sgn * s[n] * ri
        assert np.allclose(got, D, atol=1e-14)


def test_dedup_native_matches_python():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 10, 60)
    b = rng.integers(0, 10, 60)
    got = native.dedup_pairs(a, b)
    keep = np.ones(60, dtype=bool)
    for i in range(59):
        if not keep[i]:
            continue
        for j in range(i + 1, 60):
            if (a[i] == a[j] and b[i] == b[j]) or (a[i] == b[j] and b[i] == a[j]):
                keep[j] = False
    assert np.array_equal(got, keep)
