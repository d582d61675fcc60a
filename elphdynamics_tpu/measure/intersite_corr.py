"""Inter-site (bond-pair) correlation functions.

Reference: Measurements.jl:1656-2483. For every pair of bond definitions
(n″, n′) — bond n′ runs orbitals b→a displaced r′ cells, bond n″ runs d→c
displaced r″ — these estimators combine shifted single-orbital fields of the
two random vectors of each (i, j) pair into translational averages:

* BondBond (:1663-1785): ⟨K[a,b,r′](τ,r)·K[c,d,r″](0,0)⟩ with
  K = Σ_σ a⁺σ(i+r+r′)·bσ(i+r) — 2 convolution terms + a δ(a,d) contact term;
* CurrentCurrent (:1790-2384): the same contractions weighted by the (bare
  Holstein / modulated SSH) hopping amplitudes — 8 convolution terms + 4
  contact terms;
* BondPairGreens (:2390-2483): ⟨Δ[a,b,r′](τ,r)·Δ⁺[c,d,r″](0,0)⟩ — 1
  convolution term + τ=β boundary identities.

TPU-native: every term is batched over ALL vector pairs (i, j) at once (the
reference loops pairs serially); the translational averages are batched FFTs
over [P·n_bond_pairs, L1, L2, L3, Lτ] blocks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.measure import greens as G


def _cshift(F, r):
    """F(i+r): circshift by −r over the spatial axes (-4, -3, -2)."""
    return jnp.roll(F, shift=(-r[0], -r[1], -r[2]), axis=(-4, -3, -2))


def _ta(f, g):
    """Batched translational average over (L1, L2, L3, Lτ)."""
    return G.translational_average(f, g)


def _beta_slice_negated(arr_tau0):
    """C(β, r) = C(0, −r): negate the spatial displacement of the τ=0 slice
    (Measurements.jl:1770-1778). arr_tau0: [..., L1, L2, L3]."""
    return G._neg_index(arr_tau0, (-3, -2, -1))


class BondFields:
    """Cell-layout per-vector-pair fields for the intersite estimators.

    Complex-hopping (TRS twist) path: the probe fields r₁/r₂ are stored
    CONJUGATED (the estimator pairing is G↑ = E[M⁻¹R ⊙ conj R]); the
    estimator bodies then apply Re per factor on direct (cross-spin) terms
    and Re on the whole product on same-spin exchange terms — identities on
    the real path."""

    def __init__(self, lattice, R, MinvR, pair_idx):
        iu, ju = pair_idx
        self.cplx = bool(jnp.iscomplexobj(R))
        # complex128 canonicalizes to complex64 when x64 is off (TPU)
        Rc = G.to_cell_layout(lattice, R).astype(jnp.complex128)
        if self.cplx:
            Rc = jnp.conj(Rc)
        Mc = G.to_cell_layout(lattice, MinvR).astype(jnp.complex128)
        # reference naming: r₁/M⁻¹r₁ = vector i, r₂/M⁻¹r₂ = vector j
        self.r1 = Rc[iu]      # [P, no, L1, L2, L3, Lt]
        self.M1 = Mc[iu]
        self.r2 = Rc[ju]
        self.M2 = Mc[ju]

    def f(self, which, orbital):
        return getattr(self, which)[:, orbital]


def measure_bondbond(ops, pt, bf: BondFields, bond_pairs, time_dependent):
    """Measurements.jl:1663-1785. Returns [n_pairs, L1, L2, L3, Lt(+1)|1]."""
    spec = ops.spec
    Lt = ops.Ltau
    defs = spec.bond_defs
    out = []
    for (n2, n1) in bond_pairs:  # pairs[1,p]=n″=first, pairs[2,p]=n′=second
        d, c, r2v = defs[n2][0], defs[n2][1], defs[n2][2]
        b, a, r1v = defs[n1][0], defs[n1][1], defs[n1][2]

        bb = jnp.zeros(bf.r1.shape[2:], dtype=jnp.complex128)  # [L1,L2,L3,Lt]

        # + 4·⟨b(i+r,τ)a⁺(i+r+r′,τ)⟩⟨d(i,0)c⁺(i+r″,0)⟩ — direct (Σσσ'):
        # complex path takes Re per factor (spin-sum 2ReG per K operator)
        G1 = bf.f("M1", b) * _cshift(bf.f("r1", a), r1v)
        G2 = bf.f("M2", d) * _cshift(bf.f("r2", c), r2v)
        if bf.cplx:
            G1, G2 = jnp.real(G1), jnp.real(G2)
        bb = bb + 4.0 * jnp.sum(_ta(G1, G2), axis=0)

        # − 2·⟨b(i+r,τ)c⁺(i+r″,0)⟩⟨d(i,0)a⁺(i+r+r′,τ)⟩ — same-spin exchange
        # (Σσ → 2·Re of the whole contraction on the complex path)
        G2x = bf.f("M1", b) * _cshift(bf.f("r2", a), r1v)
        G1x = bf.f("M2", d) * _cshift(bf.f("r1", c), r2v)
        exch = jnp.sum(_ta(G1x, G2x), axis=0)
        if bf.cplx:
            exch = jnp.real(exch)
        bb = bb - 2.0 * exch

        # + 2·δ(a,d)·δ(r+r′)·⟨b(i+r−r″,τ)c⁺(i,0)⟩, recorded at l = −r′−r″
        # exactly as the reference does (:1750-1762)
        if a == d:
            lat = spec.lattice
            l = (np.mod(-r1v[0] - r2v[0], lat.L1),
                 np.mod(-r1v[1] - r2v[1], lat.L2),
                 np.mod(-r1v[2] - r2v[2], lat.L3))
            gval = pt.G[b, c, l[0], l[1], l[2], 0]  # pair-summed GΔ0
            bb = bb.at[l[0], l[1], l[2], 0].add(2.0 * gval)

        out.append(_finalize_tau(bb, Lt, time_dependent, beta_negated=True))
    return jnp.stack(out)


def measure_currentcurrent(ops, params, x, pt, bf: BondFields, bond_pairs,
                           time_dependent):
    """Measurements.jl:1790-2384 (Holstein uses bare t per bond, SSH the
    modulated t'(τ, bond))."""
    if bf.cplx:
        raise NotImplementedError(
            "CurrentCurrent under complex hopping: the current operator "
            "itself changes definition (J ~ i·(t·c†c − t*·c†c)), so the "
            "8+4-term contraction table must be re-derived with conj(t) "
            "placements — not yet implemented (the reference is real-only "
            "here too: Measurements.jl:1790 assumes real t weights)")
    spec = ops.spec
    Lt = ops.Ltau
    lat = spec.lattice
    defs = spec.bond_defs
    ndefs = len(defs)
    ncells = lat.ncells

    # hopping weights per definition in cell layout
    if ops.is_holstein:
        t = jnp.asarray(params.t).reshape(ndefs, lat.L3, lat.L2, lat.L1)
        t = jnp.transpose(t, (0, 3, 2, 1))[..., None]        # [def, L1,L2,L3, 1]
    else:
        from elphdynamics_tpu.models import ssh as Sm
        tp = Sm.hopping_t_prime(spec, params, x)             # [Nbonds, Lt]
        t = tp.reshape(ndefs, lat.L3, lat.L2, lat.L1, Lt)
        t = jnp.transpose(t, (0, 3, 2, 1, 4))                # [def, L1,L2,L3, Lt]
    t = t.astype(jnp.complex128)

    out = []
    for (n2, n1) in bond_pairs:
        d, c, r2v = defs[n2][0], defs[n2][1], defs[n2][2]
        b, a, r1v = defs[n1][0], defs[n1][1], defs[n1][2]
        t1 = t[n1]   # t′ weights (bond n′)
        t2 = t[n2]   # t″ weights (bond n″)

        cc = jnp.zeros(bf.r1.shape[2:], dtype=jnp.complex128)

        def term(G1, G2, coeff):
            return coeff * jnp.sum(_ta(t1 * G1, t2 * G2), axis=0)

        # (1) +4: G₁=M₁[b]·sh(r₁[a],r′), G₂=sh(M₂[c],r″)·r₂[d]
        cc = cc + term(bf.f("M1", b) * _cshift(bf.f("r1", a), r1v),
                       _cshift(bf.f("M2", c), r2v) * bf.f("r2", d), 4.0)
        # (2) −4: G₁=M₁[b]·sh(r₁[a],r′), G₂=M₂[d]·sh(r₂[c],r″)
        cc = cc + term(bf.f("M1", b) * _cshift(bf.f("r1", a), r1v),
                       bf.f("M2", d) * _cshift(bf.f("r2", c), r2v), -4.0)
        # (3) −4: G₁=sh(M₁[a],r′)·r₁[b], G₂=sh(M₂[c],r″)·r₂[d]
        cc = cc + term(_cshift(bf.f("M1", a), r1v) * bf.f("r1", b),
                       _cshift(bf.f("M2", c), r2v) * bf.f("r2", d), -4.0)
        # (4) −4 (reference accumulates −4 despite its +4 comment, :1929):
        #     G₁=sh(M₁[a],r′)·r₁[b], G₂=M₂[d]·sh(r₂[c],r″)
        cc = cc + term(_cshift(bf.f("M1", a), r1v) * bf.f("r1", b),
                       bf.f("M2", d) * _cshift(bf.f("r2", c), r2v), -4.0)
        # (5) −2: G₁=M₁[b]·sh(r₂[a],r′), G₂=sh(M₂[c],r″)·r₁[d]
        cc = cc + term(bf.f("M1", b) * _cshift(bf.f("r2", a), r1v),
                       _cshift(bf.f("M2", c), r2v) * bf.f("r1", d), -2.0)
        # (6) +2: G₁=sh(r₁[c],r″)·M₂[d], G₂=M₁[b]·sh(r₂[a],r′)
        #     with weights t″ on G₁ and t′ on G₂ (:2254-2263)
        cc = cc + 2.0 * jnp.sum(_ta(t2 * (_cshift(bf.f("r1", c), r2v) * bf.f("M2", d)),
                                    t1 * (bf.f("M1", b) * _cshift(bf.f("r2", a), r1v))),
                                axis=0)
        # (7) +2: G₁=sh(M₁[a],r′)·r₂[b], G₂=r₁[d]·sh(M₂[c],r″)
        cc = cc + term(_cshift(bf.f("M1", a), r1v) * bf.f("r2", b),
                       bf.f("r1", d) * _cshift(bf.f("M2", c), r2v), 2.0)
        # (8) −2: G₁=sh(M₁[a],r′)·r₂[b], G₂=sh(r₁[c],r″)·M₂[d]
        cc = cc + term(_cshift(bf.f("M1", a), r1v) * bf.f("r2", b),
                       _cshift(bf.f("r1", c), r2v) * bf.f("M2", d), -2.0)

        # ---- contact (δ(τ)) terms (:2297-2361) — each is a full-lattice
        # average of a shifted product, placed at one displacement
        norm = ncells * Lt

        def contact(G1, G2, l):
            # reference: circshift!(G₁G₂, G₁, +l) → G₁(i−l)·G₂(i) (:2310)
            val = jnp.sum(_cshift(t1 * G1, (-l[0], -l[1], -l[2])) * (t2 * G2),
                          axis=(-4, -3, -2, -1))
            return jnp.sum(val) / norm

        if a == c:
            l = (np.mod(r2v[0] - r1v[0], lat.L1), np.mod(r2v[1] - r1v[1], lat.L2),
                 np.mod(r2v[2] - r1v[2], lat.L3))
            v = contact(bf.f("M1", b), bf.f("r1", d), l)
            cc = cc.at[l[0], l[1], l[2], 0].add(2.0 * v)
        if a == d:
            l = (np.mod(-r1v[0], lat.L1), np.mod(-r1v[1], lat.L2),
                 np.mod(-r1v[2], lat.L3))
            v = contact(bf.f("M1", b), _cshift(bf.f("r1", c), r2v), l)
            cc = cc.at[l[0], l[1], l[2], 0].add(-2.0 * v)
        if b == c:
            l = (np.mod(r2v[0], lat.L1), np.mod(r2v[1], lat.L2), np.mod(r2v[2], lat.L3))
            v = contact(_cshift(bf.f("M1", b), r1v), bf.f("r1", d), l)
            cc = cc.at[l[0], l[1], l[2], 0].add(-2.0 * v)
        if b == d:
            v = contact(_cshift(bf.f("M1", a), r1v),
                        _cshift(bf.f("r1", c), r2v), (0, 0, 0))
            cc = cc.at[0, 0, 0, 0].add(2.0 * v)

        out.append(_finalize_tau(cc, Lt, time_dependent, beta_negated=True))
    return jnp.stack(out)


def measure_bondpairgreens(ops, pt, bf: BondFields, bond_pairs, time_dependent,
                           n_pairs: int):
    """Measurements.jl:2390-2483."""
    spec = ops.spec
    Lt = ops.Ltau
    lat = spec.lattice
    defs = spec.bond_defs
    out = []
    for (n2, n1) in bond_pairs:
        d, c, r2v = defs[n2][0], defs[n2][1], defs[n2][2]
        b, a, r1v = defs[n1][0], defs[n1][1], defs[n1][2]

        # ⟨a(r′+r+i,τ)c⁺(r″+i,0)⟩⟨b(r+i,τ)d⁺(i,0)⟩ (:2443-2455).
        # The pair operator fixes the spins (a↑c†↑)·(b↓d†↓): on the complex
        # path the ↓ factor is the conjugated estimate — conj the j-side
        # (M2 together with its stored-conjugated probe r2) wholesale.
        M2b = jnp.conj(bf.f("M2", b)) if bf.cplx else bf.f("M2", b)
        r2d = jnp.conj(bf.f("r2", d)) if bf.cplx else bf.f("r2", d)
        G2 = _cshift(bf.f("M1", a), r1v) * M2b
        G1 = _cshift(bf.f("r1", c), r2v) * r2d
        pg = jnp.sum(_ta(G2, G1), axis=0)

        if not time_dependent:
            out.append(pg[..., :1])
            continue
        main = jnp.concatenate([pg, pg[..., :1]], axis=-1)
        # τ=β corrections (:2462-2478). The wrap identities are per-spin:
        # the (a↑c†↑) factor contributes G↑ entries (pt.G_up on the complex
        # path), the (b↓d†↓) factor their conjugates; both reduce to the
        # real pt.G for real hopping.
        Gup = pt.G if pt.G_up is None else pt.G_up
        Gdn = pt.G if pt.G_up is None else jnp.conj(pt.G_up)
        beta = main[..., Lt]
        same_r = tuple(r1v) == tuple(r2v)
        if a == c and b == d and same_r:
            delta_r0 = jnp.zeros(beta.shape).at[0, 0, 0].add(1.0 * n_pairs)
            beta = beta + delta_r0
        if b == d:
            # − δ(r=0)·G↑(r′−r″; c,a; 0) placed at r = 0
            l = (np.mod(r1v[0] - r2v[0], lat.L1), np.mod(r1v[1] - r2v[1], lat.L2),
                 np.mod(r1v[2] - r2v[2], lat.L3))
            beta = beta.at[0, 0, 0].add(-Gup[a, c, l[0], l[1], l[2], 0])
        if a == c:
            # − δ(r″ = r′+r)·G↓(r; d,b; 0) at r = r″−r′
            l = (np.mod(r2v[0] - r1v[0], lat.L1), np.mod(r2v[1] - r1v[1], lat.L2),
                 np.mod(r2v[2] - r1v[2], lat.L3))
            beta = beta.at[l[0], l[1], l[2]].add(-Gdn[b, d, l[0], l[1], l[2], 0])
        main = main.at[..., Lt].set(beta)
        out.append(main)
    return jnp.stack(out)


def _finalize_tau(arr, Lt, time_dependent, beta_negated):
    """[L1, L2, L3, Lt] -> [..., Lt+1] (τ=β via C(β,r)=C(0,−r)) or [..., 1]."""
    if not time_dependent:
        return arr[..., :1]
    beta = _beta_slice_negated(arr[..., 0]) if beta_negated else arr[..., 0]
    return jnp.concatenate([arr, beta[..., None]], axis=-1)
