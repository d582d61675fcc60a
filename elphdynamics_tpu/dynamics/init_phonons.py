"""Initial phonon-field configurations (reference: InitializePhonons.jl).

Worldlines are initialised flat in τ from the quantum-harmonic-oscillator
position distribution σ = 1/√(2ω·tanh(βω/2)) (InitializePhonons.jl:107-115),
with model-specific offsets:

* Holstein: shift x₀ = (λ/ω²)·u with u uniform on {−1, 0, +1}, i.e. a site
  prepared near density 0, 1 or 2 (InitializePhonons.jl:93)
* SSH: offset −2α/ω² when the phonon type is un-aliased (InitializePhonons.jl:46-49)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.models.adapter import ModelOps


def _qho_sigma(omega, beta):
    om = jnp.asarray(omega)
    safe = jnp.where(om > 0, om, 1.0)
    sig = 1.0 / jnp.sqrt(2.0 * safe * jnp.tanh(beta * safe / 2.0))
    return jnp.where(om > 0, sig, 1.0)


def init_phonons_half_filled(ops: ModelOps, params, key):
    """Sample an initial x of shape [Nph, Lτ]."""
    key, k1, k2 = jax.random.split(key, 3)
    sigma = _qho_sigma(params.omega, ops.beta)
    base = sigma * jax.random.normal(k1, (ops.Nph,), dtype=sigma.dtype)
    if ops.is_holstein:
        om2 = jnp.where(params.omega != 0, params.omega ** 2, 1.0)
        shift = (params.lam / om2) * jax.random.randint(k2, (ops.Nph,), -1, 2).astype(base.dtype)
        x0 = base + shift
    else:
        spec = ops.spec
        # count aliases per phonon: offset applies only to un-aliased types
        counts = np.bincount(spec.primary_phonon, minlength=ops.Nph)[spec.primary_phonon]
        unique = jnp.asarray(counts == 1, base.dtype)
        om2 = jnp.where(params.omega != 0, params.omega ** 2, 1.0)
        x0 = base - unique * 2.0 * params.alpha / om2
        x0 = jnp.take(x0, jnp.asarray(spec.primary_phonon))
    x = jnp.broadcast_to(x0[:, None], (ops.Nph, ops.Ltau)).copy()
    return x, key
