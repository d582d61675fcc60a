"""Fourier-accelerated Langevin dynamics (Euler / Runge-Kutta / Heun).

Reference: LangevinDynamics.jl. The update schemes are (Q applied by FFT):

* Euler (:81-119):       Δx = √(2Δt)·√Q·η − Δt·Q·dS/dx
* Runge-Kutta (:162-225): two-stage predictor-corrector, acceleration only at
  the final combine
* Heun (:272-324):        two-stage with acceleration applied to each force

Each step is one pure jitted function ``(params, x, key) -> (x', stats,
key)``; leading batch axes on ``x`` run independent Markov chains.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from elphdynamics_tpu.dynamics.force import SolverConfig, total_force
from elphdynamics_tpu.dynamics.solve import precond_state
from elphdynamics_tpu.models.adapter import ModelOps
from elphdynamics_tpu.ops.fourier_accel import accelerate


class LangevinStats(NamedTuple):
    iters: jnp.ndarray
    flag: jnp.ndarray


def make_langevin_step(
    ops: ModelOps,
    Q_table,
    dt: float,
    method: str = "euler",
    scfg: SolverConfig = SolverConfig(),
    precond: Callable | None = None,
):
    """Build the Langevin step function for ``method`` in
    {euler, rk (update_method=2), heun (update_method=3)}."""
    Q = jnp.asarray(Q_table)

    def noise(key, x):
        key, kn = jax.random.split(key)
        eta = jax.random.normal(kn, x.shape, dtype=x.dtype)
        return ops.tie(eta), key

    def euler(params, x, key):
        eta, key = noise(key, x)
        fres, key = total_force(ops, params, x, key, scfg, precond, shifted=True)
        QdSdx = accelerate(Q, fres.dSdx, 1.0)
        sqrtQeta = accelerate(Q, eta, 0.5)
        x = x + jnp.sqrt(2.0 * dt) * sqrtQeta - dt * QdSdx
        return x, LangevinStats(fres.iters, fres.flag), key

    def rk(params, x, key):
        eta, key = noise(key, x)
        # one full preconditioner setup per step; the second (predictor)
        # force eval refreshes against its spectral bounds
        ps = precond_state(precond, params, x)
        f1, key = total_force(ops, params, x, key, scfg, precond,
                              shifted=True, pstate=ps)
        dx = jnp.sqrt(2.0 * dt) * eta - dt * f1.dSdx
        f2, key = total_force(ops, params, x + dx, key, scfg, precond,
                              shifted=True, pstate=ps)
        favg = (f1.dSdx + f2.dSdx) / 2.0
        QdSdx = accelerate(Q, favg, 1.0)
        sqrtQeta = accelerate(Q, eta, 0.5)
        x = x + jnp.sqrt(2.0 * dt) * sqrtQeta - dt * QdSdx
        return x, LangevinStats(f2.iters, jnp.maximum(f1.flag, f2.flag)), key

    def heun(params, x, key):
        eta, key = noise(key, x)
        xi = accelerate(Q, eta, 0.5)
        ps = precond_state(precond, params, x)
        f1, key = total_force(ops, params, x, key, scfg, precond,
                              shifted=True, pstate=ps)
        dG1 = accelerate(Q, f1.dSdx, 1.0)
        dx = jnp.sqrt(2.0 * dt) * xi - dt * dG1
        f2, key = total_force(ops, params, x + dx, key, scfg, precond,
                              shifted=True, pstate=ps)
        dG2 = accelerate(Q, f2.dSdx, 1.0)
        x = x + jnp.sqrt(2.0 * dt) * xi - dt * (dG1 + dG2) / 2.0
        iters = (f1.iters + f2.iters) // 2
        return x, LangevinStats(iters, jnp.maximum(f1.flag, f2.flag)), key

    return {"euler": euler, "rk": rk, "heun": heun}[method]
