"""Exact diagonalization of the single-site Holstein model.

H = ω(a†a + 1/2) + (λx + λ₂x²)·n + ω₄x⁴ − μ·n,   x = (a+a†)/√(2ω), n = n↑+n↓.

Used as ground truth for the end-to-end sampler tests (the reference treats
its single-site example config as the de-facto integration test,
examples/holstein_hmc_single_site.toml).
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
