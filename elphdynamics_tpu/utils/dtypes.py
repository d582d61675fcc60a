"""Dtype policy.

The reference is Float64 throughout (it is a CPU Julia code). On TPU, f64 is
slow, so the framework supports a configurable working dtype: simulations that
need bit-for-bit-style parity with the reference run under
``jax.config.jax_enable_x64``; production TPU runs use f32 fields with f64
reductions where it matters (CG dot products).
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
