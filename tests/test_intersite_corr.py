"""Validate the batched intersite correlation estimators against a literal
(slow, loop-based) numpy transcription of the reference algorithms
(Measurements.jl:1663-2483), using identical input fields — an exact
(non-statistical) check of the contraction structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.measure import greens as GR
from elphdynamics_tpu.measure import intersite_corr as IC
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops


def make_model(L=5, Ltau=4):
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=Ltau * 0.1, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (0.5, 0.0, 0, 0, (2, 0, 0))],
        omega=1.0, lam=0.5,
    )
    return make_model_ops(spec), spec, params


def cell(F, lat, Lt):
    """[N, Lt] -> [no, L1, L2, L3, Lt] numpy."""
    no = lat.unit_cell.norbits
    return np.transpose(F.reshape(lat.L3, lat.L2, lat.L1, no, Lt), (3, 2, 1, 0, 4))


def sh(F, r):
    """F(i+r) on [L1, L2, L3, Lt]."""
    return np.roll(F, shift=(-r[0], -r[1], -r[2]), axis=(0, 1, 2))


def ta_np(f, g):
    """fg(Δ) = Σ_{i,t} f(i+Δ, t+Δt)·g(i,t) / (ncells·Lt) — direct sum."""
    L1, L2, L3, Lt = f.shape
    out = np.zeros_like(f)
    for d1 in range(L1):
        for d2 in range(L2):
            for d3 in range(L3):
                for dt in range(Lt):
                    fs = np.roll(f, shift=(-d1, -d2, -d3, -dt), axis=(0, 1, 2, 3))
                    out[d1, d2, d3, dt] = np.sum(fs * g) / f.size
    return out


def setup_fields(ops, spec, nv=3, seed=0):
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((nv, spec.Nsites, spec.Ltau))
    Minv = rng.standard_normal((nv, spec.Nsites, spec.Ltau))
    x = jnp.asarray(0.3 * rng.standard_normal((spec.Nph, spec.Ltau)))
    pt = GR.pair_tensor_sums(spec.lattice, jnp.asarray(R), jnp.asarray(Minv))
    iu, ju = GR.pair_indices(nv)
    bf = IC.BondFields(spec.lattice, jnp.asarray(R), jnp.asarray(Minv), (iu, ju))
    return R, Minv, x, pt, (iu, ju), bf


def ref_bondbond(ops, spec, R, Minv, ptG, bond_pairs, Lt):
    lat = spec.lattice
    nv = R.shape[0]
    out = []
    for (n2, n1) in bond_pairs:
        d, c, r2v = spec.bond_defs[n2]
        b, a, r1v = spec.bond_defs[n1]
        acc = np.zeros((lat.L1, lat.L2, lat.L3, Lt), dtype=complex)
        for i in range(nv - 1):
            for j in range(i + 1, nv):
                M1 = cell(Minv[i], lat, Lt)
                r1 = cell(R[i], lat, Lt)
                M2 = cell(Minv[j], lat, Lt)
                r2 = cell(R[j], lat, Lt)
                G1 = M1[b] * sh(r1[a], r1v)
                G2 = M2[d] * sh(r2[c], r2v)
                acc += 4 * ta_np(G1, G2)
                G2x = M1[b] * sh(r2[a], r1v)
                G1x = M2[d] * sh(r1[c], r2v)
                acc -= 2 * ta_np(G1x, G2x)
        if a == d:
            l = tuple(np.mod(-np.array(r1v) - np.array(r2v),
                             [lat.L1, lat.L2, lat.L3]))
            acc[l[0], l[1], l[2], 0] += 2 * ptG[b, c, l[0], l[1], l[2], 0]
        # τ=β slice: C(β, r) = C(0, −r)
        beta = np.zeros((lat.L1, lat.L2, lat.L3), dtype=complex)
        for l1 in range(lat.L1):
            for l2 in range(lat.L2):
                for l3 in range(lat.L3):
                    beta[l1, l2, l3] = acc[-l1 % lat.L1, -l2 % lat.L2, -l3 % lat.L3, 0]
        out.append(np.concatenate([acc, beta[..., None]], axis=-1))
    return np.stack(out)


def test_bondbond_matches_reference_transcription():
    ops, spec, params = make_model()
    R, Minv, x, pt, pairs_idx, bf = setup_fields(ops, spec)
    bond_pairs = [(i, j) for i in range(2) for j in range(2)]
    got = np.asarray(IC.measure_bondbond(ops, pt, bf, bond_pairs, True))
    want = ref_bondbond(ops, spec, R, Minv, np.asarray(pt.G), bond_pairs, spec.Ltau)
    assert np.allclose(got, want, atol=1e-9), np.max(np.abs(got - want))


def ref_bondpairgreens(ops, spec, R, Minv, ptG, bond_pairs, Lt, n_pairs):
    lat = spec.lattice
    nv = R.shape[0]
    out = []
    for (n2, n1) in bond_pairs:
        d, c, r2v = spec.bond_defs[n2]
        b, a, r1v = spec.bond_defs[n1]
        acc = np.zeros((lat.L1, lat.L2, lat.L3, Lt), dtype=complex)
        for i in range(nv - 1):
            for j in range(i + 1, nv):
                M1 = cell(Minv[i], lat, Lt)
                r1 = cell(R[i], lat, Lt)
                M2 = cell(Minv[j], lat, Lt)
                r2 = cell(R[j], lat, Lt)
                G2 = sh(M1[a], r1v) * M2[b]
                G1 = sh(r1[c], r2v) * r2[d]
                acc += ta_np(G2, G1)
        beta = acc[..., 0].copy()
        if a == c and b == d and tuple(r1v) == tuple(r2v):
            beta[0, 0, 0] += n_pairs
        if b == d:
            l = tuple(np.mod(np.array(r1v) - np.array(r2v), [lat.L1, lat.L2, lat.L3]))
            beta[0, 0, 0] -= ptG[a, c, l[0], l[1], l[2], 0]
        if a == c:
            l = tuple(np.mod(np.array(r2v) - np.array(r1v), [lat.L1, lat.L2, lat.L3]))
            beta[l[0], l[1], l[2]] -= ptG[b, d, l[0], l[1], l[2], 0]
        out.append(np.concatenate([acc, beta[..., None]], axis=-1))
    return np.stack(out)


def test_bondpairgreens_matches_reference_transcription():
    ops, spec, params = make_model()
    R, Minv, x, pt, pairs_idx, bf = setup_fields(ops, spec)
    nv = R.shape[0]
    n_pairs = nv * (nv - 1) // 2
    bond_pairs = [(i, j) for i in range(2) for j in range(2)]
    got = np.asarray(IC.measure_bondpairgreens(ops, pt, bf, bond_pairs, True, n_pairs))
    want = ref_bondpairgreens(ops, spec, R, Minv, np.asarray(pt.G), bond_pairs,
                              spec.Ltau, n_pairs)
    assert np.allclose(got, want, atol=1e-9), np.max(np.abs(got - want))


def ref_currentcurrent(ops, spec, params, R, Minv, bond_pairs, Lt):
    lat = spec.lattice
    nv = R.shape[0]
    ndefs = len(spec.bond_defs)
    tarr = np.asarray(params.t).reshape(ndefs, lat.L3, lat.L2, lat.L1)
    tarr = np.transpose(tarr, (0, 3, 2, 1))[..., None]  # [def, L1, L2, L3, 1]
    out = []
    for (n2, n1) in bond_pairs:
        d, c, r2v = spec.bond_defs[n2]
        b, a, r1v = spec.bond_defs[n1]
        t1 = tarr[n1]
        t2 = tarr[n2]
        acc = np.zeros((lat.L1, lat.L2, lat.L3, Lt), dtype=complex)
        for i in range(nv - 1):
            for j in range(i + 1, nv):
                M1 = cell(Minv[i], lat, Lt)
                r1 = cell(R[i], lat, Lt)
                M2 = cell(Minv[j], lat, Lt)
                r2 = cell(R[j], lat, Lt)
                # corrected table (exact-Wick-derived; the reference CODE
                # diverges in three places where its comments agree with
                # Wick — term 4's sign (Measurements.jl:1929) and the
                # contact shifts/orbital below; see intersite_corr.py)
                terms = [
                    (+4, M1[b] * sh(r1[a], r1v), sh(M2[c], r2v) * r2[d], t1, t2),
                    (-4, M1[b] * sh(r1[a], r1v), M2[d] * sh(r2[c], r2v), t1, t2),
                    (-4, sh(M1[a], r1v) * r1[b], sh(M2[c], r2v) * r2[d], t1, t2),
                    (+4, sh(M1[a], r1v) * r1[b], M2[d] * sh(r2[c], r2v), t1, t2),
                    (-2, M1[b] * sh(r2[a], r1v), sh(M2[c], r2v) * r1[d], t1, t2),
                    (+2, sh(r1[c], r2v) * M2[d], M1[b] * sh(r2[a], r1v), t2, t1),
                    (+2, sh(M1[a], r1v) * r2[b], r1[d] * sh(M2[c], r2v), t1, t2),
                    (-2, sh(M1[a], r1v) * r2[b], sh(r1[c], r2v) * M2[d], t1, t2),
                ]
                for coeff, G1, G2, w1, w2 in terms:
                    acc += coeff * ta_np(w1 * G1, w2 * G2)
                # contact terms use vector-1 fields only; the G1 factor is
                # paired at cell (i + l) against the G2 factor at cell i
                norm = lat.ncells * Lt

                def contact(G1, G2, l):
                    # sh(F, l)(i) = F(i+l)
                    return np.sum(sh(t1 * G1, l) * (t2 * G2)) / norm

                if a == c:
                    l = tuple(np.mod(np.array(r2v) - np.array(r1v),
                                     [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] += 2 * contact(M1[b], r1[d], l)
                if a == d:
                    l = tuple(np.mod(-np.array(r1v), [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] -= 2 * contact(M1[b], sh(r1[c], r2v), l)
                if b == c:
                    l = tuple(np.mod(np.array(r2v), [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] -= 2 * contact(sh(M1[a], r1v), r1[d], l)
                if b == d:
                    acc[0, 0, 0, 0] += 2 * contact(sh(M1[a], r1v), sh(r1[c], r2v),
                                                   (0, 0, 0))
        beta = np.zeros((lat.L1, lat.L2, lat.L3), dtype=complex)
        for l1 in range(lat.L1):
            for l2 in range(lat.L2):
                for l3 in range(lat.L3):
                    beta[l1, l2, l3] = acc[-l1 % lat.L1, -l2 % lat.L2, -l3 % lat.L3, 0]
        out.append(np.concatenate([acc, beta[..., None]], axis=-1))
    return np.stack(out)


def test_currentcurrent_matches_reference_transcription():
    ops, spec, params = make_model()
    R, Minv, x, pt, pairs_idx, bf = setup_fields(ops, spec)
    bond_pairs = [(i, j) for i in range(2) for j in range(2)]
    got = np.asarray(IC.measure_currentcurrent(ops, params, x, pt, bf,
                                               bond_pairs, True))
    want = ref_currentcurrent(ops, spec, params, R, Minv, bond_pairs, spec.Ltau)
    assert np.allclose(got, want, atol=1e-9), np.max(np.abs(got - want))


# ---------------------------------------------------------------------------
# CurrentCurrent unbiasedness: exact estimator expectation (basis-vector
# enumeration) vs operator-level Wick contraction of the dense propagator.
# This is the check that exposed the three reference-code bugs the
# transcription above corrects (see measure_currentcurrent's docstring).
# ---------------------------------------------------------------------------

def currentcurrent_expectation_vs_wick(twist):
    """Returns (E[estimator], exact Wick) position tensors [L1, Lt] for a
    4-site single-orbital chain, one n.n. bond def, random phonon field.

    E over the Gaussian probe pairs is computed EXACTLY: every term is
    bilinear in each probe vector, so E = Σ_{k,l} term(e_k, e_l) over basis
    pairs; the single-vector contact terms ride along once per pair (their
    own E = Σ_k contact(e_k)), so one extra zero-partner pass separates
    them out of the (NL−1)-fold overcount."""
    import jax

    from elphdynamics_tpu.models import holstein as H

    from test_measurements import dense_Minv

    L, Ltau = 4, 4
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, L)
    kw = dict(twist=(twist,)) if twist else {}
    spec, params = H.build_holstein(
        lat, beta=Ltau * 0.1, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.5, mu=-0.2, **kw)
    ops = make_model_ops(spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(0.5 * rng.standard_normal((spec.Nph, spec.Ltau)))
    Minv = np.asarray(dense_Minv(spec, params, x)).astype(complex)
    if not twist:
        Minv = np.real(Minv).astype(complex)
    N, Lt = spec.Nsites, spec.Ltau
    NL = N * Lt
    cplx = bool(twist)

    basis = np.eye(NL).reshape(NL, N, Lt)
    MinvB = Minv.T.reshape(NL, N, Lt)         # M⁻¹e_k = column k
    Rj = jnp.asarray(basis.astype(complex) if cplx else basis)
    Mj = jnp.asarray(MinvB if cplx else np.real(MinvB))
    iu = np.repeat(np.arange(NL), NL)
    ju = np.tile(np.arange(NL), NL)
    bond_pairs = [(0, 0)]

    # all NL² ordered pairs in one batch
    Rcat = jnp.concatenate([Rj[iu], Rj[ju]], axis=0)
    Mcat = jnp.concatenate([Mj[iu], Mj[ju]], axis=0)
    n = NL * NL
    bf = IC.BondFields(lat, Rcat, Mcat, (jnp.arange(n), jnp.arange(n) + n))
    acc = np.asarray(IC.measure_currentcurrent(ops, params, x, None, bf,
                                               bond_pairs, True))[0]
    # contact-only pass: zero j-vectors kill every convolution term
    Zcat = jnp.concatenate([Rj, jnp.zeros_like(Rj)], axis=0)
    ZM = jnp.concatenate([Mj, jnp.zeros_like(Mj)], axis=0)
    bfz = IC.BondFields(lat, Zcat, ZM,
                        (jnp.arange(NL), jnp.arange(NL) + NL))
    cacc = np.asarray(IC.measure_currentcurrent(ops, params, x, None, bfz,
                                                bond_pairs, True))[0]
    acc = acc - (NL - 1) * cacc
    got = np.real(acc)[:, 0, 0, :Lt]

    # --- operator-level Wick
    Minv4 = Minv.reshape(N, Lt, N, Lt)
    tarr = np.asarray(params.t).astype(complex)
    _, _, rv = spec.bond_defs[0]
    t_cell = tarr[:lat.ncells]                # base-cell-linear order

    def site(i, dr):
        return lat.site_to_site(int(i), tuple(int(v) for v in dr), 0)

    sgn = np.concatenate([np.ones(Lt), -np.ones(Lt)])
    idx = np.concatenate([np.arange(Lt)] * 2)
    ext = (sgn[None, :, None, None] * sgn[None, None, None, :]
           * Minv4[:, idx][:, :, :, idx])
    Vn = Lt * lat.ncells
    want = np.zeros((lat.L1, Lt))
    for i in range(N):
        d_s, c_s, t2v = i, site(i, rv), t_cell[i]
        for dl in range(lat.L1):
            j = site(i, (dl, 0, 0))
            b_s, a_s, t1v = j, site(j, rv), t_cell[j]
            for t in range(Lt):
                for t0 in range(Lt):
                    ta = (t0 + t) % (2 * Lt)
                    A1 = (a_s == b_s) - ext[b_s, ta, a_s, ta]
                    Ab1 = (a_s == b_s) - ext[a_s, ta, b_s, ta]
                    j1 = 1j * (t1v * A1 - np.conj(t1v) * Ab1)
                    B2 = (c_s == d_s) - ext[d_s, t0, c_s, t0]
                    Bb2 = (c_s == d_s) - ext[c_s, t0, d_s, t0]
                    j2 = 1j * (t2v * B2 - np.conj(t2v) * Bb2)
                    # spin sum: TRS (complex t) has t↓ = t*, G↓ = conj G↑
                    # but J's explicit i does NOT conjugate, so
                    # v↓ = −conj(v↑) and each factor sums to 2i·Im(v↑);
                    # real t: v↓ = v↑ (the per-config factor is imaginary,
                    # the product lands real)
                    J1 = 2j * np.imag(j1) if cplx else 2 * j1
                    J2 = 2j * np.imag(j2) if cplx else 2 * j2

                    def X(w, xx, y, z):
                        dwz = 1.0 if (w == z and ta == t0) else 0.0
                        return (dwz - ext[z, t0, w, ta]) * ext[xx, ta, y, t0]

                    ex_up = -(t1v * t2v * X(a_s, b_s, c_s, d_s)
                              - t1v * np.conj(t2v) * X(a_s, b_s, d_s, c_s)
                              - np.conj(t1v) * t2v * X(b_s, a_s, c_s, d_s)
                              + np.conj(t1v) * np.conj(t2v)
                              * X(b_s, a_s, d_s, c_s))
                    ex = 2 * np.real(ex_up) if cplx else 2 * ex_up
                    want[dl, t] += np.real(J1 * J2 + ex) / Vn
    return got, want


@pytest.mark.slow
def test_currentcurrent_unbiased_exact_wick_real():
    got, want = currentcurrent_expectation_vs_wick(0.0)
    assert np.max(np.abs(got - want)) < 1e-10, np.max(np.abs(got - want))
