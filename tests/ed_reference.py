"""Exact diagonalization ground truths for the end-to-end sampler tests.

* Single-site Holstein:
  H = ω(a†a + 1/2) + (λx + λ₂x²)·n + ω₄x⁴ − μ·n,  x = (a+a†)/√(2ω), n = n↑+n↓
  (the reference's de-facto integration test,
  examples/holstein_hmc_single_site.toml).
* Two-site SSH dimer:
  H = ω(a†a + 1/2) + ω₄x⁴ − (t − αx)·Σσ(c†₁σc₂σ + h.c.) − μ·N
  (examples/ssh_hmc_two_site.toml; hopping convention SSHModels.jl:530-535).
"""

from __future__ import annotations

import numpy as np


def single_site_holstein_ed(beta, omega, lam, mu, lam2=0.0, omega4=0.0, nmax=120,
                            ph_symmetric=True):
    """With ``ph_symmetric=True`` the el-ph coupling is λx·(n−1): the sampled
    ensemble of the framework (and the reference) carries an extra
    e^{+Δτ·Σ(λx+λ₂x²)} weight from the Λ-shift / shifted bosonic action
    (HMC.jl:666-692 pseudofermion normalisation; PhononAction.jl:33,151), which
    is exactly a coupling shift n → n−1. μ=0 is then half filling."""
    a = np.diag(np.sqrt(np.arange(1, nmax)), 1)
    x = (a + a.T) / np.sqrt(2 * omega)
    x2 = x @ x
    hph = omega * (a.T @ a + 0.5 * np.eye(nmax)) + omega4 * (x2 @ x2)
    shift = 1 if ph_symmetric else 0

    Zs = []
    obs = {"n": 0.0, "x": 0.0, "x2": 0.0, "docc": 0.0, "E_total": 0.0}
    Z = 0.0
    acc = {k: 0.0 for k in obs}
    for n_el, degen in ((0, 1), (1, 2), (2, 1)):
        Hn = hph + (n_el - shift) * (lam * x + lam2 * x2) - mu * n_el * np.eye(nmax)
        evals, evecs = np.linalg.eigh(Hn)
        w = np.exp(-beta * (evals - evals.min()))
        scale = np.exp(-beta * evals.min())
        Zn = degen * w.sum() * scale
        Z += Zn
        rho = (evecs * (w * scale)) @ evecs.T * degen
        acc["n"] += n_el * np.trace(rho)
        acc["x"] += np.trace(rho @ x)
        acc["x2"] += np.trace(rho @ x2)
        acc["docc"] += np.trace(rho) if n_el == 2 else 0.0
        acc["E_total"] += np.trace(rho @ Hn)
    return {k: v / Z for k, v in acc.items()}


def two_site_ssh_ed(beta, omega, t, alpha, mu=0.0, omega4=0.0, nmax=40):
    """Exact thermal averages for the two-site SSH dimer.

    One bond phonon modulating the hopping, t' = t − αx
    (SSHModels.jl:530-535); electrons: 2 sites × 2 spins. Returns density
    (per site, both spins), ⟨x⟩, ⟨x²⟩, and the bond kinetic energy
    ⟨−t'·K⟩ with K = Σσ(c†₁σc₂σ + h.c.).
    """
    # phonon sector
    a = np.diag(np.sqrt(np.arange(1, nmax)), 1)
    x = (a + a.T) / np.sqrt(2 * omega)
    x2 = x @ x
    hph = omega * (a.T @ a + 0.5 * np.eye(nmax)) + omega4 * (x2 @ x2)

    # single-spin electron sector on 2 sites, basis |n1 n2⟩ = 00,10,01,11
    c1 = np.zeros((4, 4))
    c1[0, 1] = 1.0   # c1|10> = |00>
    c1[2, 3] = 1.0   # c1|11> = |01>
    c2 = np.zeros((4, 4))
    c2[0, 2] = 1.0   # c2|01> = |00>
    c2[1, 3] = -1.0  # c2|11> = -|10>
    K1 = c1.T @ c2 + c2.T @ c1
    N1 = c1.T @ c1 + c2.T @ c2
    I4 = np.eye(4)

    Kel = np.kron(K1, I4) + np.kron(I4, K1)   # both spins
    Nel = np.kron(N1, I4) + np.kron(I4, N1)
    Iel = np.eye(16)
    Iph = np.eye(nmax)

    H = (np.kron(hph, Iel)
         - t * np.kron(Iph, Kel)
         + alpha * np.kron(x, Kel)
         - mu * np.kron(Iph, Nel))
    evals, evecs = np.linalg.eigh(H)
    w = np.exp(-beta * (evals - evals.min()))
    Z = w.sum()
    rho = (evecs * w) @ evecs.T / Z

    def avg(op):
        return float(np.trace(rho @ op))

    el_ke = avg(-t * np.kron(Iph, Kel) + alpha * np.kron(x, Kel))
    return {
        "n": avg(np.kron(Iph, Nel)) / 2.0,
        "x": avg(np.kron(x, Iel)),
        "x2": avg(np.kron(x2, Iel)),
        "el_ke": el_ke,
    }


def two_site_holstein_ed(beta, omega, t, lam, mu=0.0, nmax=10):
    """Exact thermal averages for the two-site Holstein dimer: one phonon
    per site, hopping t between the sites, ph-symmetric coupling
    λxᵢ(nᵢ−1) (the sampled ensemble's Λ-shift normalisation — see
    single_site_holstein_ed). Returns per-site density, ⟨x⟩, ⟨x²⟩, double
    occupancy, and the bond kinetic energy ⟨−t·K⟩."""
    a = np.diag(np.sqrt(np.arange(1, nmax)), 1)
    xm = (a + a.T) / np.sqrt(2 * omega)
    Iph1 = np.eye(nmax)
    hph1 = omega * (a.T @ a + 0.5 * Iph1)
    Hph = np.kron(hph1, Iph1) + np.kron(Iph1, hph1)
    X1 = np.kron(xm, Iph1)
    X2 = np.kron(Iph1, xm)

    # electron sector: 2 sites × 2 spins (same operators as the SSH dimer)
    c1 = np.zeros((4, 4))
    c1[0, 1] = 1.0
    c1[2, 3] = 1.0
    c2 = np.zeros((4, 4))
    c2[0, 2] = 1.0
    c2[1, 3] = -1.0
    K1 = c1.T @ c2 + c2.T @ c1
    n1 = c1.T @ c1
    n2 = c2.T @ c2
    I4 = np.eye(4)
    Kel = np.kron(K1, I4) + np.kron(I4, K1)
    N1el = np.kron(n1, I4) + np.kron(I4, n1)
    N2el = np.kron(n2, I4) + np.kron(I4, n2)
    D1 = np.kron(n1, I4) @ np.kron(I4, n1)
    D2 = np.kron(n2, I4) @ np.kron(I4, n2)
    Nel = N1el + N2el
    Iel = np.eye(16)
    Iph = np.eye(nmax * nmax)

    H = (np.kron(Hph, Iel)
         - t * np.kron(Iph, Kel)
         + lam * np.kron(X1, N1el - Iel)
         + lam * np.kron(X2, N2el - Iel)
         - mu * np.kron(Iph, Nel))
    evals, evecs = np.linalg.eigh(H)
    w = np.exp(-beta * (evals - evals.min()))
    Z = w.sum()
    rho = (evecs * w) @ evecs.T / Z

    def avg(op):
        return float(np.trace(rho @ op))

    return {
        "n": avg(np.kron(Iph, Nel)) / 2.0,
        "x": avg(np.kron((X1 + X2) / 2.0, Iel)),
        "x2": avg(np.kron((X1 @ X1 + X2 @ X2) / 2.0, Iel)),
        "docc": avg(np.kron(Iph, (D1 + D2) / 2.0)),
        "el_ke": avg(-t * np.kron(Iph, Kel)),
    }
