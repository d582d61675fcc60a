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


def fermionic_force(
    ops: ModelOps,
    params,
    x,
    derived,
    g,
    scfg: SolverConfig,
    precond: Callable | None = None,
):
    """−2·gᵀ·[∂M/∂x]·M⁻¹g given the Gaussian vector ``g``
    (LangevinDynamics.jl:350-384, CG branch)."""
    rhs = ops.mulMT(params, derived, g)
    sol = solvers.solve_checked(
        lambda v: ops.mulMTM(params, derived, v),
        rhs,
        apply_P=precond,
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
    precond: Callable | None = None,
    shifted: bool = True,
):
    """∂S/∂x = ∂Sb/∂x − 2gᵀ[∂M/∂x]M⁻¹g with a fresh Gaussian g
    (LangevinDynamics.jl:334-345)."""
    derived = ops.derived(params, x)
    key, kg = jax.random.split(key)
    g = jax.random.normal(kg, x.shape[:-2] + (ops.Nsites, ops.Ltau), dtype=x.dtype)
    fres = fermionic_force(ops, params, x, derived, g, scfg, precond)
    dSdx = fres.dSdx + ops.calc_dSbdx(params, x, shifted)
    return ForceResult(dSdx=dSdx, iters=fres.iters, flag=fres.flag), key
