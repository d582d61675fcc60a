"""Small numeric helpers (reference: Utilities.jl).

The reference's index-mapping helpers (``get_index/get_site/get_τ``,
Utilities.jl:12-31) have no analog here: fields are natively shaped
``[N, L_tau]`` so the (τ, site) flattening never exists.
"""

from __future__ import annotations

import jax.numpy as jnp


def simpson(f, dx):
    """Simpson integration over the leading axis of ``f``.

    Matches the reference rule (Utilities.jl:65-76): composite Simpson over
    odd-length prefix plus a 3-point correction for an even number of samples.
    Operates on the first axis; trailing axes are batched.
    """
    f = jnp.asarray(f)
    L = f.shape[0]
    total = jnp.zeros(f.shape[1:], dtype=f.dtype)
    # composite simpson over i = 2,4,... (1-based i in 2:2:L-1)
    # contributions dx*(f[i-1]/3 + 4 f[i]/3 + f[i+1]/3) with 0-based idx (i-2,i-1,i)
    if L >= 3:
        n_panels = (L - 1) // 2
        idx = 2 * jnp.arange(n_panels)
        total = total + dx * (
            f[idx] / 3 + 4 * f[idx + 1] / 3 + f[idx + 2] / 3
        ).sum(axis=0)
    if L % 2 == 0 and L >= 3:
        total = total + dx * (5 / 12 * f[L - 1] + 2 / 3 * f[L - 2] - 1 / 12 * f[L - 3])
    return total
