"""Dtype policy + accurate accumulation primitives.

The reference is Float64 throughout (it is a CPU Julia code;
IterativeSolvers.jl's κ-abort exists because MᵀM becomes ill-conditioned).
On TPU, f64 is software-emulated and slow, so the framework keeps fields in
f32 and makes the *reductions* robust instead:

* under ``jax.config.jax_enable_x64`` (CPU parity mode) every dot product,
  norm and action/energy sum accumulates in f64 (:func:`fdot`/:func:`fsum`);
* without x64 (TPU production) the same reductions run with exact
  Veltkamp/Dekker two-products and a separately summed error channel, which
  removes the O(n·ε) product-rounding term and leaves only the O(log n·ε)
  tree-reduction error of XLA's summation.

Used by the CG/BiCGStab dot products and residual checks
(:mod:`elphdynamics_tpu.solvers`) and by the HMC energies ΔH = H₁−H₀ whose
Metropolis test suffers catastrophic cancellation of O(N·Lτ)-sized actions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def set_x64(enable: bool = True) -> None:
    """Enable/disable 64-bit mode globally (must run before tracing)."""
    jax.config.update("jax_enable_x64", bool(enable))


def default_real_dtype():
    """The widest real dtype currently available (f64 under x64, else f32)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def accum_dtype():
    """Dtype used for reductions (dot products, norms)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# 2^12 + 1: Veltkamp splitting constant for a 24-bit (f32) mantissa.
_SPLIT_F32 = 4097.0


def _two_product_f32(a, b):
    """Exact product a·b = p + err in f32 (Dekker two-product via Veltkamp
    splits; no FMA needed). Valid for |a|,|b| ≲ 8e34."""
    p = a * b
    c = jnp.asarray(_SPLIT_F32, a.dtype)
    ca = c * a
    ah = ca - (ca - a)
    al = a - ah
    cb = c * b
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _two_sum(a, b):
    """Error-free transform a + b = s + err (Knuth two-sum)."""
    s = a + b
    bp = s - a
    err = (a - (s - a)) + (b - (s - bp))
    return s, err


def fsum(a, axis=None):
    """Accurate sum: f64 accumulation when available, else compensated f32.

    In f32 mode the array is reduced by XLA's (tree-ordered) ``jnp.sum`` —
    already O(log n·ε) — so only the f64 upcast needs handling here.
    """
    if jax.config.jax_enable_x64 and a.dtype == jnp.float32:
        return jnp.sum(a.astype(jnp.float64), axis=axis)
    return jnp.sum(a, axis=axis)


def fdot(a, b, axis=(-2, -1)):
    """Accurate batched inner product ``Σ a·b`` over ``axis``.

    f64 accumulation under x64; exact two-products with a separately summed
    error channel in pure-f32 (TPU) mode.
    """
    if jax.config.jax_enable_x64:
        if a.dtype == jnp.float32:
            return jnp.sum(a.astype(jnp.float64) * b.astype(jnp.float64), axis=axis)
        return jnp.sum(a * b, axis=axis)
    if a.dtype == jnp.float32:
        p, e = _two_product_f32(a, b)
        return jnp.sum(p, axis=axis) + jnp.sum(e, axis=axis)
    return jnp.sum(a * b, axis=axis)
