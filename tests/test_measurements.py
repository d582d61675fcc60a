"""Validate the stochastic estimator and measurement assembly against dense
M⁻¹ expectations on a small fixed phonon configuration.

The random-vector estimators are unbiased: E[(M⁻¹r)_a r_b] = M⁻¹[a,b] and
cross-pair products factorise, so with many vectors the measured quantities
must converge to values computed directly from the dense inverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.dynamics.force import SolverConfig
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.measure import greens as GR
from elphdynamics_tpu.measure.measurements import (
    MeasurementSpec, make_measurement_step, zero_container, process_bin,
)
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from dense_reference import dense_expK, dense_M


def make_model(L=3, Ltau=4, lam=0.5, mu=-0.2, seed=0):
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=Ltau * 0.1, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=lam, mu=mu,
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(0.3 * rng.standard_normal((spec.Nph, spec.Ltau)))
    return make_model_ops(spec), spec, params, x


def dense_Minv(spec, params, x):
    env = np.asarray(H.expnV(spec, params, x))
    expK = dense_expK(spec.Nsites, spec.ckb.neighbor_table, spec.ckb.groups,
                      np.asarray(params.cosht), np.asarray(params.sinht))
    M = dense_M([expK @ np.diag(env[:, t]) for t in range(spec.Ltau)])
    return np.linalg.inv(M)


def greens_expectation_tensor(spec, Minv):
    """Exact E[conv(Ma, Ra)] with antiperiodic doubling: the translation-
    averaged time-ordered Green's function on the doubled τ axis."""
    N, L = spec.Nsites, spec.Ltau
    lat = spec.lattice
    ncells = lat.ncells
    no = lat.unit_cell.norbits
    Minv4 = Minv.reshape(N, L, N, L)
    # antiperiodic extension in both time arguments
    sgn = np.concatenate([np.ones(L), -np.ones(L)])
    ext = (sgn[None, :, None, None] * sgn[None, None, None, :]
           * Minv4[:, np.concatenate([np.arange(L)] * 2)][:, :, :, np.concatenate([np.arange(L)] * 2)])
    V = 2 * L * ncells
    out = np.zeros((no, no, lat.L1, lat.L2, lat.L3, 2 * L), dtype=complex)
    for i in range(N):
        for dl1 in range(lat.L1):
            for dl2 in range(lat.L2):
                for dl3 in range(lat.L3):
                    j = lat.site_to_site(i, (dl1, dl2, dl3), lat.site_to_orbit[i])
                    # only norbits=1 here
                    for t in range(2 * L):
                        for t0 in range(2 * L):
                            out[0, 0, dl1, dl2, dl3, t] += ext[j, (t0 + t) % (2 * L), i, t0]
    return out / V


def test_greens_pair_tensor_unbiased():
    ops, spec, params, x = make_model()
    Minv = dense_Minv(spec, params, x)
    want = greens_expectation_tensor(spec, Minv)

    nv = 400
    gd, _ = GR.sample_greens(ops, params, x, jax.random.PRNGKey(0), nv,
                             SolverConfig(tol=1e-10, maxiter=3000))
    pt = GR.pair_tensor_sums(spec.lattice, gd.R, gd.MinvR)
    got = np.asarray(pt.G) / pt.n_pairs
    err = np.max(np.abs(got - want))
    assert err < 0.05, err


@pytest.mark.slow
def test_density_and_doubleocc_unbiased():
    ops, spec, params, x = make_model()
    Minv = dense_Minv(spec, params, x)
    N, L = spec.Nsites, spec.Ltau
    G_diag = np.diagonal(Minv).reshape(N, L)     # ⟨c c†⟩ on the diagonal
    density_exact = 2.0 * (1.0 - G_diag.mean())
    docc_exact = ((1.0 - G_diag) ** 2).mean()

    mspec = MeasurementSpec(nv=100, onsite_corr=(), intersite_corr=())
    step = make_measurement_step(ops, mspec, SolverConfig(tol=1e-10, maxiter=3000))
    # average over several independent measurement sweeps
    key = jax.random.PRNGKey(1)
    acc = zero_container(ops, mspec)
    nsweeps = 10
    for _ in range(nsweeps):
        inc, stats, snaps, key = step(params, x, key)
        acc = jax.tree.map(lambda a, b: a + b, acc,
                           {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=nsweeps)
    # per-vector σ of the trace estimator is O(0.5); 1000 samples → σ≈0.02
    assert abs(float(res["global"]["density"]) - density_exact) < 0.06
    assert abs(float(res["onsite"]["density"][0]) - density_exact) < 0.06
    assert abs(float(res["onsite"]["double_occ"][0]) - docc_exact) < 0.08
    assert abs(float(res["onsite"]["x"][0]) - float(jnp.mean(x))) < 1e-9
    assert abs(float(res["global"]["mu"]) - float(jnp.mean(params.mu))) < 1e-12


def test_el_ke_unbiased():
    ops, spec, params, x = make_model()
    Minv = dense_Minv(spec, params, x)
    N, L = spec.Nsites, spec.Ltau
    Minv4 = Minv.reshape(N, L, N, L)
    # exact per-pair expectation of −t·h with h = −(G↑₁₂+G↑₂₁+G↓₁₂+G↓₂₁):
    # both spins contribute an identical dense-G term (factor 2)
    want = 0.0
    for b in range(spec.Nbonds):
        n = spec.bond_to_ckb[b]
        s1, s2 = spec.ckb.neighbor_table[:, n]
        t = float(np.asarray(params.t)[b])
        for tau in range(L):
            g12 = Minv4[s1, tau, s2, tau]
            g21 = Minv4[s2, tau, s1, tau]
            want += -t * (-2.0 * (g12 + g21))
    want /= spec.lattice.ncells * L

    mspec = MeasurementSpec(nv=40)
    step = make_measurement_step(ops, mspec, SolverConfig(tol=1e-10, maxiter=3000))
    key = jax.random.PRNGKey(2)
    acc = zero_container(ops, mspec)
    nsweeps = 6
    for _ in range(nsweeps):
        inc, stats, snaps, key = step(params, x, key)
        acc = jax.tree.map(lambda a, b: a + b, acc, {k: inc[k] for k in acc})
    res = process_bin(ops, mspec, acc, bin_size=nsweeps)
    assert abs(float(res["intersite"]["el_ke"][0]) - want) < 0.1, (
        float(res["intersite"]["el_ke"][0]), want)


@pytest.mark.slow
def test_correlation_containers_and_susceptibility_shapes():
    ops, spec, params, x = make_model()
    mspec = MeasurementSpec(
        nv=6,
        onsite_corr=(("Greens", True), ("DenDen", True), ("SpinSpin", True),
                     ("PairGreens", True), ("PhononGreens", True)),
    )
    step = make_measurement_step(ops, mspec, SolverConfig(tol=1e-8, maxiter=2000))
    inc, stats, snaps, _ = step(params, x, jax.random.PRNGKey(3))
    L1, Lt = spec.lattice.L1, spec.Ltau
    for kind in ("Greens", "DenDen", "SpinSpin", "PairGreens", "PhononGreens"):
        assert inc["onsite_corr"][kind].shape == (1, L1, 1, 1, Lt + 1), kind
    res = process_bin(ops, mspec, inc, bin_size=1)
    for s in ("PairSusc", "ChargeSusc", "SpinSusc"):
        assert res["onsite_susc"][s]["position"].shape == (1, L1, 1, 1)
    # Greens τ=β identity: G(β, r) = δᵣ − G(0, r)
    g = np.asarray(res["onsite_corr"]["Greens"]["position"])[0]
    npairs = 6 * 5 // 2
    delta = np.zeros((L1, 1, 1))
    delta[0, 0, 0] = 1.0
    assert np.allclose(g[..., Lt], delta - g[..., 0], atol=1e-10)


def test_explicit_measurement_pairs():
    """Per-measurement `pairs` lists (Measurements.jl:776-782): an explicit
    single-pair Greens container matches the corresponding slice of the
    all-pairs container."""
    ops, spec, params, x = make_model()
    m_all = MeasurementSpec(nv=6, onsite_corr=(("Greens", True),))
    m_one = MeasurementSpec(nv=6, onsite_corr=(("Greens", True, ((0, 0),)),))
    inc_a, *_ = make_measurement_step(ops, m_all, SolverConfig(tol=1e-8, maxiter=2000))(
        params, x, jax.random.PRNGKey(9))
    inc_o, *_ = make_measurement_step(ops, m_one, SolverConfig(tol=1e-8, maxiter=2000))(
        params, x, jax.random.PRNGKey(9))
    assert inc_o["onsite_corr"]["Greens"].shape[0] == 1
    assert np.allclose(np.asarray(inc_o["onsite_corr"]["Greens"][0]),
                       np.asarray(inc_a["onsite_corr"]["Greens"][0]), atol=1e-12)


def test_greens_correlation_matches_exact():
    ops, spec, params, x = make_model()
    Minv = dense_Minv(spec, params, x)
    want6 = greens_expectation_tensor(spec, Minv)  # [no,no,L1,L2,L3,2L]

    mspec = MeasurementSpec(nv=200, onsite_corr=(("Greens", True),))
    step = make_measurement_step(ops, mspec, SolverConfig(tol=1e-10, maxiter=3000))
    inc, stats, snaps, _ = step(params, x, jax.random.PRNGKey(4))
    res = process_bin(ops, mspec, inc, bin_size=1)
    got = np.asarray(res["onsite_corr"]["Greens"]["position"])[0]  # [L1,1,1,Lt+1]
    want = want6[0, 0][..., :spec.Ltau]
    err = np.max(np.abs(got[..., :spec.Ltau] - want))
    assert err < 0.05, err


def test_simpson_matches_reference_rule():
    """Composite Simpson + even-length correction (Utilities.jl:65-76):
    exact for cubics at odd sample counts, exact for quadratics at even."""
    from elphdynamics_tpu.utils.math import simpson

    dx = 0.1
    # odd number of samples: cubic integrated exactly
    L = 11
    t = dx * np.arange(L)
    f = 2.0 * t ** 3 - t ** 2 + 0.5 * t + 1.0
    exact = (2.0 / 4 * t[-1] ** 4 - t[-1] ** 3 / 3 + 0.25 * t[-1] ** 2 + t[-1])
    got = float(simpson(jnp.asarray(f), dx))
    assert abs(got - exact) < 1e-12, (got, exact)
    # even number of samples: quadratic integrated exactly
    L = 10
    t = dx * np.arange(L)
    f = 3.0 * t ** 2 - 2.0 * t + 0.7
    exact = t[-1] ** 3 - t[-1] ** 2 + 0.7 * t[-1]
    got = float(simpson(jnp.asarray(f), dx))
    assert abs(got - exact) < 1e-12, (got, exact)
    # batched trailing axes
    fb = np.stack([f, 2 * f], axis=-1)
    gb = np.asarray(simpson(jnp.asarray(fb), dx))
    np.testing.assert_allclose(gb, [exact, 2 * exact], atol=1e-12)


def test_process_bin_momentum_and_susceptibility_conventions():
    """The momentum transform is fftn over the three spatial axes
    (Measurements.jl:1160-1170) and the susceptibility is the Simpson
    ∫₀^β dτ of the correlation (:2550-2572) — verified against manual numpy
    on a hand-filled container."""
    from elphdynamics_tpu.measure.measurements import (
        MeasurementSpec, process_bin, zero_container)
    from elphdynamics_tpu.utils.math import simpson as jsimpson

    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.5, mu=0.0)
    ops = make_model_ops(spec)
    mspec = MeasurementSpec(nv=4, onsite_corr=(("PairGreens", True, None),))
    cont = zero_container(ops, mspec)
    rng = np.random.default_rng(3)
    shape = cont["onsite_corr"]["PairGreens"].shape   # [p, L1, L2, L3, T]
    fake = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    V = 1 * (4 * 3 // 2)  # bin_size * C(nv, 2)
    cont["onsite_corr"]["PairGreens"] = jnp.asarray(fake * V)

    out = process_bin(ops, mspec, cont, bin_size=1)
    pos = np.asarray(out["onsite_corr"]["PairGreens"]["position"])
    mom = np.asarray(out["onsite_corr"]["PairGreens"]["momentum"])
    np.testing.assert_allclose(pos, fake, atol=1e-10)
    np.testing.assert_allclose(mom, np.fft.fftn(fake, axes=(1, 2, 3)), atol=1e-8)
    susc = np.asarray(out["onsite_susc"]["PairSusc"]["position"])
    manual = np.asarray(jsimpson(jnp.moveaxis(jnp.asarray(fake), -1, 0), 0.1))
    np.testing.assert_allclose(susc, manual, atol=1e-10)


def test_convolve_dft_matmul_matches_fft():
    """The DFT-matmul lowering of the measurement convolutions
    (greens.DFT_MATMUL, the KPM dft_matmul trick applied to the estimator
    stage) is bit-consistent with the FFT path at f64."""
    import numpy as np
    from elphdynamics_tpu.measure import greens as GR

    rng = np.random.default_rng(21)
    a = jnp.asarray(rng.standard_normal((3, 2, 6, 4, 1, 10)))
    b = jnp.asarray(rng.standard_normal((3, 2, 6, 4, 1, 10)))
    f = jnp.asarray(rng.standard_normal((5, 6, 4, 1, 10)))
    g = jnp.asarray(rng.standard_normal((5, 6, 4, 1, 10)))
    old = GR.DFT_MATMUL
    try:
        GR.DFT_MATMUL = False
        c_fft = np.asarray(GR.convolve(a, b, 7.0))
        t_fft = np.asarray(GR.translational_average(f, g))
        GR.DFT_MATMUL = True
        c_dft = np.asarray(GR.convolve(a, b, 7.0))
        t_dft = np.asarray(GR.translational_average(f, g))
    finally:
        GR.DFT_MATMUL = old
    np.testing.assert_allclose(c_dft, c_fft, atol=1e-12)
    np.testing.assert_allclose(t_dft, t_fft, atol=1e-12)
