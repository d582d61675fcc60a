"""Independent dense numpy constructions used to verify the matrix-free ops.

These build the operators from first principles (elementary 2x2 bond
rotations, explicit block matrices) without sharing any code with the
library's gather/fold kernels. Flattened index convention: (site, tau) ->
site * Ltau + tau, matching a C-order reshape of [N, Ltau] fields.
"""

from __future__ import annotations

import numpy as np


def dense_expK(nsites, neighbor_table, groups, cosh_b, sinh_b, tau=None):
    """Dense product of bond rotations in checkerboard application order.

    ``neighbor_table``/``groups``/coefficients are in checkerboard (grouped)
    order. ``checkerboard_mul`` applies bond 0 first, so the matrix is
    E_{nb-1} ... E_1 E_0.
    """
    nb = neighbor_table.shape[1]
    cplx = np.iscomplexobj(cosh_b) or np.iscomplexobj(sinh_b)
    D = np.eye(nsites, dtype=np.complex128 if cplx else np.float64)
    for n in range(nb):
        i, j = neighbor_table[0, n], neighbor_table[1, n]
        c = cosh_b[n] if np.ndim(cosh_b[n]) == 0 else cosh_b[n][tau]
        s = sinh_b[n] if np.ndim(sinh_b[n]) == 0 else sinh_b[n][tau]
        E = np.eye(nsites, dtype=D.dtype)
        E[i, i] = c
        E[j, j] = c
        E[i, j] = s
        # conj(s) on the second endpoint (Checkerboard.jl:78) — identity
        # for real s, the Hermitian bond block for complex hopping
        E[j, i] = np.conj(s)
        D = E @ D
    return D


def dense_M(B_blocks):
    """Dense fermion matrix from per-slice propagators B(τ) (N x N each).

    M[τ,τ'] = I δ(τ,τ') − B(τ) δ(τ,τ'+1) with +B(0) in the (0, Lτ-1) corner.
    Index convention (site, τ) -> site*Lτ + τ.
    """
    L = len(B_blocks)
    N = B_blocks[0].shape[0]
    M = np.zeros((N * L, N * L),
                 dtype=np.complex128 if np.iscomplexobj(B_blocks[0])
                 else np.float64)

    def idx(site, tau):
        return site * L + tau

    for tau in range(L):
        for site in range(N):
            M[idx(site, tau), idx(site, tau)] = 1.0
    for tau in range(L):
        taum = (tau - 1) % L
        sgn = +1.0 if tau == 0 else -1.0
        B = B_blocks[tau]
        for a in range(N):
            for b in range(N):
                if B[a, b] != 0.0:
                    M[idx(a, tau), idx(b, taum)] += sgn * B[a, b]
    return M


def flatten_field(v):
    """[N, L] -> [N*L] with (site, tau) -> site*L + tau."""
    return np.asarray(v).reshape(-1)


def unflatten_field(v, N, L):
    return np.asarray(v).reshape(N, L)
