"""End-to-end HMC throughput vs lattice size on the real TPU chip.

Produces the BASELINE.md scaling table: sweeps/s/chip and CG iters/solve for
the north-star HMC config at 8×8 / 16×16 / 32×32, with the chain batch
scaled down as the per-chain footprint grows.

Run from the repo root: python scripts/bench_scaling.py [--dense 0|1]
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
    ap.add_argument("--dense", type=int, default=1,
                    help="1 = dense-MXU exp(-dtau K) path, 0 = group fold")
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    print(f"device={jax.devices()[0]} dense={args.dense}")
    print(f"{'L':>4} {'N':>6} {'chains':>7} {'sweeps/s':>9} {'iters':>6} {'acc':>6}")
    for L, chains in ((8, 128), (16, 64), (32, 32)):
        uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
        lat = Lattice.create(uc, L)
        spec, params = build_holstein(
            lat, beta=4.0, dtau=0.1,
            t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                           (1.0, 0.0, 0, 0, (0, 1, 0))],
            omega=1.0, lam=1.0, mu=0.0,
            dense_threshold=(4096 if args.dense else 0))
        ops = make_model_ops(spec)
        mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau,
                          [dict(omega_min=0.0, omega_max=10.0, mass=0.5)])
        cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-5, maxiter=500,
                        construct_guess=True, guess_order=3)
        precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=4))
        step = make_hmc_step(ops, mass, cfg, precond)

        keys = jax.random.split(jax.random.PRNGKey(0), chains)
        xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
        state = HMCState(x=xs, v=jnp.zeros_like(xs))
        vstep = jax.jit(jax.vmap(step, in_axes=(None, 0, 0)))
        for _ in range(2):
            state, stats, keys = vstep(params, state, keys)
        jax.block_until_ready(state.x)
        t0 = time.time()
        for _ in range(args.steps):
            state, stats, keys = vstep(params, state, keys)
        jax.block_until_ready(state.x)
        dt = time.time() - t0
        print(f"{L:>4} {spec.Nsites:>6} {chains:>7} "
              f"{args.steps * chains / dt:>9.1f} "
              f"{float(jnp.mean(stats.iters.astype(jnp.float32))):>6.1f} "
              f"{float(jnp.mean(stats.accepted)):>6.3f}")


if __name__ == "__main__":
    main()
