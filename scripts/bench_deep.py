"""Deep-β HMC arms bench: block CG × loop_precision × dt on full updates.

Runs the complete HMC update (trajectory solves, forces, Metropolis) for a
list of arms at one (L, β) point and reports sweeps/s, CG iters/solve,
acceptance, mean |ΔH|, and flag counts. This is the decisive on-chip
wall-time A/B that the round-3 CPU iteration studies (scripts/
study_block_beta.py) could not take, plus the split-precision arm
(VERDICT r3 items 1-2).

Run from the repo root:
    python scripts/bench_deep.py --L 8 --beta 16 --chains 32 [--steps 10]
        [--dt 0.05] [--arms base,block,high,block+high]
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
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--beta", type=float, default=16.0)
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--equil", type=int, default=30)
    ap.add_argument("--max-order", type=int, default=4)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--arms", type=str, default="base,block,high,block+high")
    args = ap.parse_args()

    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
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

    def make_vstep(block=False, loop_precision=None, dt=None):
        cfg = HMCConfig(dt=dt or args.dt, trajectory_time=1.0, Nb=4, tol=1e-5,
                        maxiter=1000, construct_guess=True, guess_order=3,
                        block=block, loop_precision=loop_precision)
        return jax.jit(jax.vmap(make_hmc_step(ops, mass, cfg, precond),
                                in_axes=(None, 0, 0)))

    ARMS = {
        "base": dict(),
        "block": dict(block=True),
        "high": dict(loop_precision="high"),
        "block+high": dict(block=True, loop_precision="high"),
    }

    vstep0 = make_vstep()
    keys = jax.random.split(jax.random.PRNGKey(0), args.chains)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    st = HMCState(x=xs, v=jnp.zeros_like(xs))
    t0 = time.time()
    for _ in range(args.equil):
        st, stats, keys = vstep0(params, st, keys)
    jax.block_until_ready(st.x)
    print(f"device={jax.devices()[0]} L={args.L} beta={args.beta} "
          f"Ltau={spec.Ltau} chains={args.chains} dt={args.dt} "
          f"(equil {args.equil}, {time.time()-t0:.0f}s)", flush=True)

    print(f"{'arm':>12} {'sweeps/s':>9} {'iters':>6} {'acc':>6} "
          f"{'<|dH|>':>9} {'flags':>6} {'run_s':>7}")
    for arm in args.arms.split(","):
        kw = dict(ARMS[arm.split("@")[0]])
        if "@" in arm:   # e.g. base@0.1 overrides dt
            kw["dt"] = float(arm.split("@")[1])
        vstep = make_vstep(**kw)
        stp, kp = st, keys
        stp, stats, kp = vstep(params, stp, kp)
        jax.block_until_ready(stp.x)
        accs, dhs, its, fls = [], [], [], []
        tb = time.time()
        for _ in range(args.steps):
            stp, stats, kp = vstep(params, stp, kp)
            accs.append(stats.accepted)
            dhs.append(stats.delta_H)
            its.append(stats.iters)
            fls.append(stats.flag)
        jax.block_until_ready(stp.x)
        run_s = time.time() - tb
        rate = args.steps * args.chains / run_s
        acc = float(jnp.mean(jnp.stack(accs).astype(jnp.float32)))
        adh = float(jnp.mean(jnp.abs(jnp.stack(dhs))))
        it = float(jnp.mean(jnp.stack(its).astype(jnp.float32)))
        nfl = int(jnp.sum(jnp.stack(fls) > 0))
        print(f"{arm:>12} {rate:>9.1f} {it:>6.1f} {acc:>6.3f} "
              f"{adh:>9.2e} {nfl:>6d} {run_s:>7.2f}", flush=True)


if __name__ == "__main__":
    main()
