"""On-chip A/B of the two-level near-null preconditioner (ops/nearnull.py)
through FULL HMC updates at deep β — the decisive wall-time test the dense
studies (scripts/study_near_null.py stages A-F) cannot take.

Arms: the production KPM preconditioner vs two-level variants
(refresh mode x smoothing budget x k). Reports sweeps/s, CG iters/solve,
acceptance, |dH|, flags.

Run from the repo root:
    python scripts/bench_nearnull.py --L 8 --beta 16 --chains 32
        [--steps 10] [--dt 0.06] [--arms kpm,nn,nn-assemble,nn-freeze,nn-k16]
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
    ap.add_argument("--arms", type=str, default="kpm,nn,nn-assemble,nn-freeze")
    args = ap.parse_args()

    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
    from elphdynamics_tpu.lattice import Lattice, UnitCell
    from elphdynamics_tpu.models.adapter import make_model_ops
    from elphdynamics_tpu.models.holstein import build_holstein
    from elphdynamics_tpu.ops import kpm
    from elphdynamics_tpu.ops.fourier_accel import build_mass
    from elphdynamics_tpu.ops.nearnull import NearNullConfig, make_nearnull_precond

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
    kcfg = kpm.KPMConfig(max_order=args.max_order)

    ARMS = {
        "kpm": None,
        "nn": NearNullConfig(),                      # k=16, refresh 3
        "nn-assemble": NearNullConfig(refresh_mode="assemble"),
        "nn-freeze": NearNullConfig(refresh_mode="freeze"),
        "nn-r5": NearNullConfig(refresh_iters=5),
        "nn-k8": NearNullConfig(k=8),
        "nn-k32": NearNullConfig(k=32),
        "nn-c2": NearNullConfig(c=2),
    }

    def make_vstep(ncfg):
        precond = (kpm.make_symmetric_precond(ops, kcfg) if ncfg is None
                   else make_nearnull_precond(ops, kcfg, ncfg))
        cfg = HMCConfig(dt=args.dt, trajectory_time=1.0, Nb=4, tol=1e-5,
                        maxiter=1000, construct_guess=True, guess_order=3,
                        loop_precision="high")
        return jax.jit(jax.vmap(make_hmc_step(ops, mass, cfg, precond),
                                in_axes=(None, 0, 0)))

    # shared equilibration with the KPM arm
    vstep0 = make_vstep(None)
    keys = jax.random.split(jax.random.PRNGKey(0), args.chains)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0] for k in keys])
    st = HMCState(x=xs, v=jnp.zeros_like(xs))
    t0 = time.time()
    for _ in range(args.equil):
        st, stats, keys = vstep0(params, st, keys)
    jax.block_until_ready(st.x)
    print(f"device={jax.devices()[0]} L={args.L} beta={args.beta} "
          f"Ltau={spec.Ltau} chains={args.chains} dt={args.dt} "
          f"(equil {args.equil}, {time.time() - t0:.0f}s)")
    print(f"{'arm':>12} {'sweeps/s':>9} {'iters':>6} {'acc':>6} "
          f"{'<|dH|>':>9} {'flags':>6} {'run_s':>7}")

    for arm in args.arms.split(","):
        ncfg = ARMS[arm]
        vstep = make_vstep(ncfg)
        st_a, keys_a = st, keys
        st_a, stats, keys_a = vstep(params, st_a, keys_a)  # compile+warm
        jax.block_until_ready(st_a.x)
        accs, dhs, its, fls = [], [], [], []
        t0 = time.time()
        for _ in range(args.steps):
            st_a, stats, keys_a = vstep(params, st_a, keys_a)
            accs.append(stats.accepted)
            dhs.append(stats.delta_H)
            its.append(stats.iters)
            fls.append(stats.flag)
        jax.block_until_ready(st_a.x)
        dt_run = time.time() - t0
        sweeps = args.steps * args.chains / dt_run
        acc = float(jnp.mean(jnp.stack(accs).astype(jnp.float32)))
        adh = float(jnp.mean(jnp.abs(jnp.stack(dhs))))
        it = float(jnp.mean(jnp.stack(its).astype(jnp.float32)))
        nfl = int(jnp.sum(jnp.stack(fls) > 0))
        print(f"{arm:>12} {sweeps:9.1f} {it:6.1f} {acc:6.3f} "
              f"{adh:9.2e} {nfl:6d} {dt_run:7.2f}", flush=True)


if __name__ == "__main__":
    main()
