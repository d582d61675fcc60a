"""Stochastic forces for phonon-field dynamics.

Reference: LangevinDynamics.jl:334-384. The fermionic force is estimated from
one fresh Gaussian vector per call:

    ∂S_f/∂xᵢ(τ) = −2·gᵀ·[∂M/∂xᵢ(τ)]·M⁻¹g

with ``M⁻¹g`` obtained from the CG solve of ``MᵀM·x = Mᵀg``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elphdynamics_tpu.dynamics.solve import (  # noqa: F401  (re-exported)
    SolverConfig,
    resolve_precond,
    solve_minv,
)
from elphdynamics_tpu.models.adapter import ModelOps


class ForceResult(NamedTuple):
    dSdx: jnp.ndarray
    iters: jnp.ndarray
    flag: jnp.ndarray


def _apply_P(precond, params, x):
    """Backward-compatible resolver: returns the *symmetric* preconditioner
    apply closure (reference cadence: ``setup!`` before every force solve,
    LangevinDynamics.jl:364)."""
    pa = resolve_precond(precond, params, x)
    return pa.symmetric if pa else None


def fermionic_force(
    ops: ModelOps,
    params,
    x,
    derived,
    g,
    scfg: SolverConfig,
    pa=None,
):
    """−2·gᵀ·[∂M/∂x]·M⁻¹g given the Gaussian vector ``g``
    (LangevinDynamics.jl:350-384; solver-kind dispatch per Models.jl)."""
    sol = solve_minv(ops, params, derived, g, scfg, pa)
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
    pstate=None,
):
    """∂S/∂x = ∂Sb/∂x − 2gᵀ[∂M/∂x]M⁻¹g with a fresh Gaussian g
    (LangevinDynamics.jl:334-345). ``precond`` is a
    :class:`~elphdynamics_tpu.ops.kpm.Preconditioner`; a ``pstate`` from an
    earlier full setup skips the spectral-bounds recomputation."""
    derived = ops.derived(params, x)
    key, kg = jax.random.split(key)
    from elphdynamics_tpu.utils.dtypes import trace_noise
    g = trace_noise(kg, params, x.shape[:-2] + (ops.Nsites, ops.Ltau),
                    x.dtype)
    pa = resolve_precond(precond, params, x, prev_state=pstate)
    fres = fermionic_force(ops, params, x, derived, g, scfg, pa)
    dSdx = fres.dSdx + ops.calc_dSbdx(params, x, shifted)
    return ForceResult(dSdx=dSdx, iters=fres.iters, flag=fres.flag), key
