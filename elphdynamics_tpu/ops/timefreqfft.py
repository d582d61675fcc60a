"""Unitary map between antiperiodic imaginary time τ and frequency ω.

Reference: TimeFreqFFTs.jl:32-144. A phase twist Θ(τ) = exp(−iπτ/Lτ)
converts antiperiodic boundary conditions to periodic, then a plain FFT along
τ diagonalises time translations. Fields are [..., N, Lτ]; the transform acts
on the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def theta(Ltau: int):
    return np.exp(-1j * np.pi * np.arange(Ltau) / Ltau)


def tau_to_omega(v, th=None):
    """ν = F·Θ·v (TimeFreqFFTs.jl:55-86)."""
    Ltau = v.shape[-1]
    if th is None:
        th = jnp.asarray(theta(Ltau))
    return jnp.fft.fft(th * v, axis=-1)


def omega_to_tau(v, th=None, real: bool = True):
    """v = Θ†·F⁻¹·ν (TimeFreqFFTs.jl:92-144)."""
    Ltau = v.shape[-1]
    if th is None:
        th = jnp.asarray(theta(Ltau))
    out = jnp.conj(th) * jnp.fft.ifft(v, axis=-1)
    return jnp.real(out) if real else out
