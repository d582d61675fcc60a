"""Validate the batched intersite correlation estimators against a literal
(slow, loop-based) numpy transcription of the reference algorithms
(Measurements.jl:1663-2483), using identical input fields — an exact
(non-statistical) check of the contraction structure."""

import jax
import jax.numpy as jnp
import numpy as np

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
                terms = [
                    (+4, M1[b] * sh(r1[a], r1v), sh(M2[c], r2v) * r2[d], t1, t2),
                    (-4, M1[b] * sh(r1[a], r1v), M2[d] * sh(r2[c], r2v), t1, t2),
                    (-4, sh(M1[a], r1v) * r1[b], sh(M2[c], r2v) * r2[d], t1, t2),
                    (-4, sh(M1[a], r1v) * r1[b], M2[d] * sh(r2[c], r2v), t1, t2),
                    (-2, M1[b] * sh(r2[a], r1v), sh(M2[c], r2v) * r1[d], t1, t2),
                    (+2, sh(r1[c], r2v) * M2[d], M1[b] * sh(r2[a], r1v), t2, t1),
                    (+2, sh(M1[a], r1v) * r2[b], r1[d] * sh(M2[c], r2v), t1, t2),
                    (-2, sh(M1[a], r1v) * r2[b], sh(r1[c], r2v) * M2[d], t1, t2),
                ]
                for coeff, G1, G2, w1, w2 in terms:
                    acc += coeff * ta_np(w1 * G1, w2 * G2)
                # contact terms use vector-1 fields only (:2297-2361)
                norm = lat.ncells * Lt

                def contact(G1, G2, l):
                    return np.sum(np.roll(t1 * G1, shift=l, axis=(0, 1, 2)) *
                                  (t2 * G2)) / norm

                if a == c:
                    l = tuple(np.mod(np.array(r2v) - np.array(r1v),
                                     [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] += 2 * contact(M1[b], r1[d], l)
                if a == d:
                    l = tuple(np.mod(-np.array(r1v), [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] -= 2 * contact(M1[b], sh(r1[c], r2v), l)
                if b == c:
                    l = tuple(np.mod(np.array(r2v), [lat.L1, lat.L2, lat.L3]))
                    acc[l[0], l[1], l[2], 0] -= 2 * contact(sh(M1[b], r1v), r1[d], l)
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
