"""Deep-β KPM diagnosis on the real chip (the BASELINE.md §deep-β data).

Equilibrates Holstein L×L at β under the production HMC config, then:

1. probes ONE fresh solve under a sweep of preconditioner configs —
   including ``exact_lowfreq`` up to ALL frequencies exact — separating
   "polynomial degree too low" from "the τ-averaged block-diagonal
   approximation itself broke down" (solving every frequency block exactly
   still leaving ~the same iterations proves the latter);
2. extracts the Ritz spectrum of P⁻¹MᵀM from a python-level PCG's
   tridiagonal — the deflation-potential map (how κ_eff falls as the k
   smallest modes are removed).

Run from the repo root: python scripts/study_deep_beta.py [beta] [L]
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
from elphdynamics_tpu.dynamics.solve import (PrecondApplies, SolverConfig,
                                             solve_oinv)
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.models.holstein import build_holstein
from elphdynamics_tpu.ops import kpm
from elphdynamics_tpu.ops.fourier_accel import build_mass


def equilibrate(L, beta, chains=8, n_updates=10):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = build_holstein(
        lat, beta=beta, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=1.0, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-5, maxiter=500,
                    construct_guess=True, guess_order=3)
    precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=8))
    step = make_hmc_step(ops, mass, cfg, precond)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    state = HMCState(x=xs, v=jnp.zeros_like(xs))
    vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))
    for _ in range(n_updates):
        state, stats, keys = vstep(params, state, keys)
    jax.block_until_ready(state.x)
    print("equilibrated: iters", np.asarray(stats.iters),
          "acc", float(jnp.mean(stats.accepted)), flush=True)
    return ops, params, state.x[0]


def probe_configs(ops, params, x):
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((2, ops.Nsites, ops.Ltau)), x.dtype)
    derived = ops.derived(params, x)
    rhs = ops.mulMT(params, derived, b)
    scfg = SolverConfig(tol=1e-5, maxiter=2000)
    Lw = (ops.Ltau + 1) // 2

    def iters_with(kcfg):
        def go(x, rhs):
            stp = kpm.setup(ops, params, x, kcfg, jax.random.PRNGKey(1))
            pa = PrecondApplies(
                symmetric=lambda w: kpm.apply_symmetric(ops, stp, w, kcfg),
                left=None, right=None)
            res = solve_oinv(ops, params, derived, rhs, scfg, pa)
            return res.iters, res.flag, stp.active
        it, fl, a = jax.jit(go)(x, rhs)
        return int(np.max(np.asarray(it))), int(np.max(np.asarray(fl))), bool(a)

    res = jax.jit(lambda rhs: solve_oinv(ops, params, derived, rhs, scfg,
                                         None))(rhs)
    print(f"{'none':>16}: iters={int(np.max(np.asarray(res.iters)))}")
    for label, kcfg in [
        ("cheb4", kpm.KPMConfig(max_order=4)),
        ("cheb8", kpm.KPMConfig(max_order=8)),
        ("cheb32", kpm.KPMConfig(max_order=32)),
        ("cheb4+k8", kpm.KPMConfig(max_order=4, exact_lowfreq=8)),
        ("cheb8+k16", kpm.KPMConfig(max_order=8, exact_lowfreq=16)),
        (f"allexact(k={Lw})", kpm.KPMConfig(max_order=4, exact_lowfreq=Lw)),
    ]:
        it, fl, a = iters_with(kcfg)
        print(f"{label:>16}: iters={it} flag={fl} active={a}", flush=True)


def ritz_spectrum(ops, params, x, niter=300):
    kcfg = kpm.KPMConfig(max_order=8)
    derived = ops.derived(params, x)
    st = jax.jit(lambda x: kpm.setup(ops, params, x, kcfg,
                                     jax.random.PRNGKey(1)))(x)
    A = jax.jit(lambda v: ops.mulMTM(params, derived, v))
    Pinv = jax.jit(lambda st, v: kpm.apply_symmetric(ops, st, v, kcfg))

    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((ops.Nsites, ops.Ltau)), x.dtype)
    z = Pinv(st, r)
    p = z
    rz = float(jnp.vdot(r, z))
    alphas, betas = [], []
    for _ in range(niter):
        Ap = A(p)
        alpha = rz / float(jnp.vdot(p, Ap))
        r = r - alpha * Ap
        z = Pinv(st, r)
        rz_new = float(jnp.vdot(r, z))
        alphas.append(alpha)
        betas.append(rz_new / rz)
        p = z + (rz_new / rz) * p
        rz = rz_new
        if rz_new < 1e-28:
            break
    m = len(alphas)
    T = np.zeros((m, m))
    for k in range(m):
        T[k, k] = 1.0 / alphas[k] + (betas[k - 1] / alphas[k - 1] if k else 0.0)
        if k + 1 < m:
            T[k, k + 1] = T[k + 1, k] = np.sqrt(betas[k]) / alphas[k]
    ritz = np.sort(np.linalg.eigvalsh(T))
    print(f"Ritz spectrum of P⁻¹MᵀM ({m} PCG steps):")
    print("smallest 16:", np.array2string(ritz[:16], precision=5))
    print("largest:", f"{ritz[-1]:.3f}", "median:", f"{np.median(ritz):.3f}")
    for k in (0, 8, 16, 32, 64):
        if k < m:
            kap = ritz[-1] / ritz[k]
            print(f"deflating {k:>3} smallest → κ_eff ≈ {kap:9.1f} "
                  f"→ CG-iters bound ≈ {0.5 * np.sqrt(kap) * np.log(2e5):5.0f}")


if __name__ == "__main__":
    beta = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ops, params, x = equilibrate(L, beta)
    probe_configs(ops, params, x)
    ritz_spectrum(ops, params, x)
