"""Stochastic forces for phonon-field dynamics.

Reference: LangevinDynamics.jl:334-384. The fermionic force is estimated from
one fresh Gaussian vector per call:

    ∂S_f/∂xᵢ(τ) = −2·gᵀ·[∂M/∂xᵢ(τ)]·M⁻¹g

with ``M⁻¹g`` obtained from the CG solve of ``MᵀM·x = Mᵀg``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from elphdynamics_tpu import solvers
from elphdynamics_tpu.models.adapter import ModelOps


class SolverConfig(NamedTuple):
    tol: float = 1e-5
    maxiter: int = 1000
    kappa_max: float = 1e12


class ForceResult(NamedTuple):
    dSdx: jnp.ndarray
    iters: jnp.ndarray
    flag: jnp.ndarray


def _apply_P(precond, params, x):
    """Resolve a (setup_fn, apply_fn) preconditioner pair into an apply
    closure for the current phonon configuration (reference cadence:
    ``setup!`` before every force solve, LangevinDynamics.jl:364)."""
    if precond is None:
        return None
    setup_fn, apply_fn = precond
    st = setup_fn(params, x)
    return lambda v: apply_fn(st, v)


def fermionic_force(
    ops: ModelOps,
    params,
    x,
    derived,
    g,
    scfg: SolverConfig,
    apply_P: Callable | None = None,
):
    """−2·gᵀ·[∂M/∂x]·M⁻¹g given the Gaussian vector ``g``
    (LangevinDynamics.jl:350-384, CG branch)."""
    rhs = ops.mulMT(params, derived, g)
    sol = solvers.solve_checked(
        lambda v: ops.mulMTM(params, derived, v),
        rhs,
        apply_P=apply_P,
        tol=scfg.tol,
        maxiter=scfg.maxiter,
        kappa_max=scfg.kappa_max,
    )
    dSf = -2.0 * ops.muldMdx(params, derived, x, g, sol.x)
    return ForceResult(dSdx=dSf, iters=sol.iters, flag=sol.flag)


def total_force(
    ops: ModelOps,
    params,
    x,
    key,
    scfg: SolverConfig,
    precond=None,
    shifted: bool = True,
):
    """∂S/∂x = ∂Sb/∂x − 2gᵀ[∂M/∂x]M⁻¹g with a fresh Gaussian g
    (LangevinDynamics.jl:334-345). ``precond`` is a (setup, apply) pair."""
    derived = ops.derived(params, x)
    key, kg = jax.random.split(key)
    g = jax.random.normal(kg, x.shape[:-2] + (ops.Nsites, ops.Ltau), dtype=x.dtype)
    fres = fermionic_force(ops, params, x, derived, g, scfg, _apply_P(precond, params, x))
    dSdx = fres.dSdx + ops.calc_dSbdx(params, x, shifted)
    return ForceResult(dSdx=dSdx, iters=fres.iters, flag=fres.flag), key
