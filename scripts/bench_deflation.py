"""Deep-β deflation A/B on the real chip (BASELINE.md §deep-β).

Holstein L×L at β: equilibrate once without deflation, then for each
basis size k restart from the SAME equilibrated ensemble with a fresh
basis, run `adapt` updates for the incremental filter to build the basis
(the accumulation the dense study showed is required), and time `steps`
production updates. Reports sweeps/s, CG iters/solve, acceptance.

Run from the repo root:
    python scripts/bench_deflation.py [--beta 16] [--L 8] [--chains 32]
        [--ks 0,32,64,128] [--adapt 20] [--steps 10] [--max-order 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beta", type=float, default=16.0)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--ks", default="0,32,64,128")
    ap.add_argument("--adapt", type=int, default=20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--equil", type=int, default=30)
    ap.add_argument("--max-order", type=int, default=8)
    ap.add_argument("--filter-degree", type=int, default=8)
    ap.add_argument("--cutoff", type=float, default=1/16)
    args = ap.parse_args()

    from elphdynamics_tpu.dynamics.hmc import (HMCConfig, HMCState,
                                               init_deflation, make_hmc_step)
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, args.L)
    spec, params = build_holstein(
        lat, beta=args.beta, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=1.0, mu=0.0)
    ops = make_model_ops(spec)
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
    precond = kpm.make_symmetric_precond(
        ops, kpm.KPMConfig(max_order=args.max_order))

    def make(cfg):
        step = make_hmc_step(ops, mass, cfg, precond)
        return jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))

    base_cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-5,
                         maxiter=1000, construct_guess=True, guess_order=3)
    keys = jax.random.split(jax.random.PRNGKey(0), args.chains)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    st0 = HMCState(x=xs, v=jnp.zeros_like(xs))
    vstep0 = make(base_cfg)
    t0 = time.time()
    for _ in range(args.equil):
        st0, stats, keys = vstep0(params, st0, keys)
    jax.block_until_ready(st0.x)
    print(f"device={jax.devices()[0]} L={args.L} beta={args.beta} "
          f"Ltau={spec.Ltau} chains={args.chains} max_order={args.max_order}")
    print(f"equilibrated ({args.equil} updates, {time.time()-t0:.0f}s): "
          f"iters={float(jnp.mean(stats.iters.astype(jnp.float32))):.1f} "
          f"acc={float(jnp.mean(stats.accepted)):.3f}")
    x_eq, keys_eq = st0.x, keys

    print(f"{'k':>5} {'sweeps/s':>9} {'iters':>6} {'acc':>6} {'adapt_s':>8} {'run_s':>7}")
    for k in [int(s) for s in args.ks.split(",")]:
        cfg = base_cfg._replace(deflate_k=k, deflate_filter=args.filter_degree,
                                deflate_cutoff=args.cutoff)
        vstep = make(cfg)
        defl = None
        if k > 0:
            dkeys = jax.random.split(jax.random.PRNGKey(7), args.chains)
            defl = jax.vmap(lambda kk: init_deflation(ops, cfg, kk))(dkeys)
        st = HMCState(x=x_eq, v=jnp.zeros_like(x_eq), defl=defl)
        keys = keys_eq
        ta = time.time()
        for _ in range(args.adapt):
            st, stats, keys = vstep(params, st, keys)
        jax.block_until_ready(st.x)
        adapt_s = time.time() - ta
        tb = time.time()
        for _ in range(args.steps):
            st, stats, keys = vstep(params, st, keys)
        jax.block_until_ready(st.x)
        run_s = time.time() - tb
        iters = float(jnp.mean(stats.iters.astype(jnp.float32)))
        acc = float(jnp.mean(stats.accepted))
        sweeps = args.steps * args.chains / run_s
        print(f"{k:>5} {sweeps:>9.1f} {iters:>6.1f} {acc:>6.3f} "
              f"{adapt_s:>8.1f} {run_s:>7.1f}", flush=True)


if __name__ == "__main__":
    main()
