"""Global "special" Monte Carlo moves: reflection and swap updates.

Reference: SpecialUpdates.jl. These beat HMC ergodicity stalls in the
bimodal phonon landscape:

* ReflectionUpdate (:58-165, Holstein only): propose x_i(τ) → −x_i(τ) on a
  whole site worldline;
* SwapUpdate (:233-300 Holstein — exchange worldlines across a random bond;
  :302-366 SSH — exchange two random phonon worldlines).

Each proposal is an exact Metropolis test: resample the pseudofermion φ at
the current configuration (so S₀ = Σ±|R±|²/2 + Sb exactly,
SpecialUpdates.jl:127,267), apply the move, evaluate the new action with tol²
endpoint solves, accept/reject. The per-move sequential chain is a lax.scan
(the tests are sequentially dependent by construction).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from elphdynamics_tpu.models.adapter import ModelOps


class SpecialUpdateConfig(NamedTuple):
    freq: int = 1       # apply every `freq` sampler updates (0 = never)
    n_moves: int = 0    # sites (reflection) or bonds/pairs (swap) per call
    tol: float = 1e-5
    maxiter: int = 1000


def _eval_S(ops: ModelOps, params, x, phi, tol, maxiter, precond=None):
    """S = Sb + Σ± (Λφ±)ᵀO⁻¹(Λφ±)/2 at configuration x (HMC.jl:743-783)."""
    from elphdynamics_tpu.dynamics.solve import (
        SolverConfig, resolve_precond, solve_oinv)

    derived = ops.derived(params, x)
    if ops.calc_Lambda is not None:
        Lam = ops.calc_Lambda(params, x)
        Lphi = ops.mulLambda(Lam, phi)
    else:
        Lphi = phi
    pa = resolve_precond(precond, params, x)
    sol = solve_oinv(ops, params, derived, Lphi,
                     SolverConfig(tol=tol, maxiter=maxiter), pa)
    from elphdynamics_tpu.utils.dtypes import fdot
    Sf = fdot(Lphi, sol.x, axis=(0, -2, -1)) / 2
    S = Sf + ops.calc_Sb(params, x, False)
    iters = (jnp.sum(sol.iters) + 1) // 2
    return S, iters, jnp.max(sol.flag)


def _refresh_phi(ops: ModelOps, params, x, key):
    """φ± = Λ⁻¹MᵀR± and the exact action S₀ = Σ±|R±|²/2 + Sb
    (HMC.jl:666-692)."""
    key, kp = jax.random.split(key)
    from elphdynamics_tpu.utils.dtypes import pseudofermion_noise
    R = pseudofermion_noise(kp, params, (ops.Nsites, ops.Ltau), x.dtype)
    derived = ops.derived(params, x)
    MtR = ops.mulMT(params, derived, R)
    if ops.calc_Lambda is not None:
        Lam = ops.calc_Lambda(params, x)
        phi = ops.mulLambdaInv(Lam, MtR)
    else:
        phi = MtR
    from elphdynamics_tpu.utils.dtypes import fdot
    S0 = fdot(R, R, axis=(0, -2, -1)) / 2 + ops.calc_Sb(params, x, False)
    return phi, S0, key


def make_reflection_update(ops: ModelOps, cfg: SpecialUpdateConfig, precond=None):
    """Reflection x → −x on randomly chosen sites (Holstein only;
    SpecialUpdates.jl:97-160). Returns ``(params, x, key) -> (x, acc_rate, key)``."""
    if not ops.is_holstein:
        def null(params, x, key):
            return x, jnp.asarray(0.0), key
        return null

    nmoves = min(cfg.n_moves, ops.Nph)

    def update(params, x, key):
        key, ks = jax.random.split(key)
        sites = jax.random.randint(ks, (nmoves,), 0, ops.Nph)

        def body(carry, site):
            x, accepted, key = carry
            phi, S0, key = _refresh_phi(ops, params, x, key)
            x_new = x.at[site].multiply(-1.0)
            S1, iters, flag = _eval_S(ops, params, x_new, phi,
                                      cfg.tol ** 2, cfg.maxiter, precond)
            P = jnp.minimum(1.0, jnp.exp(-(S1 - S0)))
            key, ka = jax.random.split(key)
            acc = (jax.random.uniform(ka, dtype=P.dtype) < P) & (flag == 0)
            x = jnp.where(acc, x_new, x)
            return (x, accepted + acc, key), None

        (x, accepted, key), _ = lax.scan(body, (x, jnp.asarray(0, jnp.int32), key), sites)
        return x, accepted / jnp.maximum(nmoves, 1), key

    return update


def make_swap_update(ops: ModelOps, cfg: SpecialUpdateConfig, precond=None):
    """Swap update: exchange phonon worldlines across a random bond
    (Holstein, SpecialUpdates.jl:233-300) or between two random phonons
    (SSH, :302-366)."""
    nmoves = cfg.n_moves

    if ops.is_holstein:
        if ops.spec.Nbonds == 0 or nmoves == 0:
            def null(params, x, key):
                return x, jnp.asarray(0.0), key
            return null
        # sites of each checkerboard bond
        s1 = jnp.asarray(ops.spec.ckb.neighbor_table[0])
        s2 = jnp.asarray(ops.spec.ckb.neighbor_table[1])

        def pick(key):
            key, kb = jax.random.split(key)
            b = jax.random.randint(kb, (), 0, ops.spec.Nbonds)
            return (s1[b], s2[b]), key
    else:
        if ops.Nph < 2 or nmoves == 0:
            def null(params, x, key):
                return x, jnp.asarray(0.0), key
            return null

        def pick(key):
            key, k1, k2 = jax.random.split(key, 3)
            i = jax.random.randint(k1, (), 0, ops.Nph)
            # draw j != i (reference redraws while equal, :326-328)
            j = jax.random.randint(k2, (), 0, ops.Nph - 1)
            j = jnp.where(j >= i, j + 1, j)
            return (i, j), key

    def update(params, x, key):
        def body(carry, _):
            x, accepted, key = carry
            (i, j), key = pick(key)
            phi, S0, key = _refresh_phi(ops, params, x, key)
            xi = x[i]
            xj = x[j]
            x_new = x.at[i].set(xj).at[j].set(xi)
            S1, iters, flag = _eval_S(ops, params, x_new, phi,
                                      cfg.tol ** 2, cfg.maxiter, precond)
            P = jnp.minimum(1.0, jnp.exp(-(S1 - S0)))
            key, ka = jax.random.split(key)
            acc = (jax.random.uniform(ka, dtype=P.dtype) < P) & (flag == 0)
            x = jnp.where(acc, x_new, x)
            return (x, accepted + acc, key), None

        (x, accepted, key), _ = lax.scan(
            body, (x, jnp.asarray(0, jnp.int32), key), None, length=nmoves)
        return x, accepted / jnp.maximum(nmoves, 1), key

    return update
