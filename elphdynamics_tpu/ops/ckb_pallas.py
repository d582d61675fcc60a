"""Fused checkerboard group-fold as a single Pallas TPU kernel.

The XLA group fold (ops/checkerboard._apply_groups) materialises the field
between groups: ``ngroups`` gather+FMA passes over HBM per application. This
kernel keeps the whole ``[N, K]`` space-time block resident in VMEM and folds
ALL groups in one pass — one HBM read + one write per application, the
bandwidth lower bound. The per-site partner permutations and (c, s)
coefficient tables are precomputed and live in VMEM beside the field.

Intended regime: large lattices (N ≳ 10³) where the dense-MXU path's O(N²·K)
FLOPs dominate and the group fold is bandwidth-bound (the dense path keeps
winning below the crossover — see BASELINE.md scaling table).

Reference semantics: Checkerboard.jl:57-121 (forward), :149-230 (transpose =
reversed group order), :238-316 (inverse = flipped sinh sign).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.ops.checkerboard import CheckerboardSpec

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover - pallas always ships with jax
    HAS_PALLAS = False


def _offset_classes(spec: CheckerboardSpec, order):
    """Decompose each group's involutive partner permutation into uniform
    site-index offset classes (dynamic sublane gathers are not supported in
    Mosaic; a lattice group's partners sit at a handful of fixed offsets —
    ±1 / ±L plus the PBC wrap — so ``v[partner]`` becomes a short static sum
    of masked ``pltpu.roll``s)."""
    sites = np.arange(spec.nsites)
    per_group = []
    for g in order:
        d = spec.partner[g] - sites
        offs = sorted({int(o) for o in np.unique(d) if o != 0})
        masks = [(d == o) for o in offs]
        per_group.append((offs, masks))
    max_off = max((len(o) for o, _ in per_group), default=1)
    offsets = np.zeros((len(order), max_off), dtype=np.int64)
    mask = np.zeros((len(order), max_off, spec.nsites), dtype=np.float32)
    for gi, (offs, masks) in enumerate(per_group):
        for k, (o, m) in enumerate(zip(offs, masks)):
            offsets[gi, k] = o
            mask[gi, k] = m
    return offsets, mask


def _site_tables(spec: CheckerboardSpec, cosh_b, sinh_b, reverse: bool, sign: float):
    """Per-site (c, s) coefficient tables [G, N] in application order, plus
    the static offset decomposition of the partner permutations."""
    order = list(range(spec.ngroups - 1, -1, -1) if reverse else range(spec.ngroups))
    cosh_b = jnp.asarray(cosh_b)
    sinh_b = jnp.asarray(sinh_b)
    cs, ss = [], []
    for g in order:
        bos = jnp.asarray(spec.bond_of_site[g])
        m = jnp.asarray(spec.mask[g])
        cs.append(jnp.where(m, cosh_b[bos], 1.0))
        ss.append(jnp.where(m, sign * sinh_b[bos], 0.0))
    offsets, mask = _offset_classes(spec, order)
    return offsets, mask, jnp.stack(cs), jnp.stack(ss)


def _fold_kernel(mask_ref, c_ref, s_ref, v_ref, o_ref, *, offsets):
    """Fold on a ``[tk, N]`` block — sites on the LANE axis, so the partner
    permutation's offset classes become cheap lane rotations."""
    v = v_ref[:]
    G, n_off = offsets.shape
    N = v.shape[1]
    for g in range(G):                    # static unroll: few groups
        vp = jnp.zeros_like(v)
        for k in range(n_off):            # static offset classes
            d = int(offsets[g, k])
            if d == 0:
                continue
            # roll(v, s)[i] = v[i-s]; want vp[i] = v[i+d] → s = (−d) mod N
            vp = vp + mask_ref[g, k, :][None, :] * pltpu.roll(v, (-d) % N, axis=1)
        v = c_ref[g, :][None, :] * v + s_ref[g, :][None, :] * vp
    o_ref[:] = v


def fold_2d(spec: CheckerboardSpec, cosh_b, sinh_b, v2d, *,
            reverse: bool = False, sign: float = 1.0, tile_k: int = 512,
            interpret: bool = False):
    """Apply the full group fold to a ``[N, K]`` block in one fused kernel."""
    offsets, mask, c, s = _site_tables(spec, cosh_b, sinh_b, reverse, sign)
    N, K = v2d.shape
    vkn = v2d.T  # [K, N]: sites on lanes
    # keep in + out + the vp temporary within a conservative VMEM budget;
    # the in/out blocks are DOUBLE-BUFFERED by the pipeline (×2 each), so
    # the per-tile footprint is ~5 blocks — the round-3 "Mosaic compile
    # failure" at N=4096 was exactly this budget overflowing (tk=192 ⇒
    # ~15 MB + tables), not a Mosaic limitation; tk ≤ 96 compiles and runs
    budget = 9 * 2 ** 20
    tk_max = max(8, (budget // (5 * 4 * N)) // 8 * 8)
    tk = min(tile_k, K, tk_max)
    grid = (pl.cdiv(K, tk),)
    G, n_off = offsets.shape
    out = pl.pallas_call(
        partial(_fold_kernel, offsets=offsets),
        out_shape=jax.ShapeDtypeStruct((K, N), v2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, n_off, N), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, N), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(mask, v2d.dtype), c.astype(v2d.dtype), s.astype(v2d.dtype), vkn)
    return out.T


def _fold_fused_kernel(mask_ref, c_ref, s_ref, pre_ref, post_ref, abc_ref,
                       v_ref, *rest, offsets, use_prev):
    """Fold + affine epilogue on a ``[tk, N]`` block:

        o = a·(post ⊙ fold(pre ⊙ v)) + b·v + c·prev

    — the Chebyshev recurrence step of the KPM preconditioner in ONE pass
    (``prev`` optional). XLA cannot fuse elementwise producers/consumers
    into a pallas_call, so without this every recurrence step materialises
    the scale/combine as separate HBM passes (measured ~30% of 64×64 HMC
    step self-time, profile round 5)."""
    if use_prev:
        prev_ref, o_ref = rest
    else:
        (o_ref,) = rest
    v_in = v_ref[:]
    v = v_in * pre_ref[0, :][None, :]
    G, n_off = offsets.shape
    N = v.shape[1]
    for g in range(G):
        vp = jnp.zeros_like(v)
        for k in range(n_off):
            d = int(offsets[g, k])
            if d == 0:
                continue
            vp = vp + mask_ref[g, k, :][None, :] * pltpu.roll(v, (-d) % N, axis=1)
        v = c_ref[g, :][None, :] * v + s_ref[g, :][None, :] * vp
    v = v * post_ref[0, :][None, :]
    a = abc_ref[0, 0]
    b = abc_ref[0, 1]
    o = a * v + b * v_in
    if use_prev:
        o = o + abc_ref[0, 2] * prev_ref[:]
    o_ref[:] = o


def fold_kn_fused(spec: CheckerboardSpec, cosh_b, sinh_b, vkn, *,
                  reverse: bool = False, sign: float = 1.0,
                  pre=None, post=None, a=1.0, b=0.0, c=0.0, prev=None,
                  tile_k: int = 512, interpret: bool = False):
    """``a·(post⊙fold(pre⊙v)) + b·v + c·prev`` on a ``[K, N]`` block (sites
    already on lanes — the caller keeps the whole recurrence in this layout
    and transposes once at entry/exit instead of per fold). ``pre``/``post``
    are optional per-site [N] diagonals (the averaged exp(−Δτ·V̄) factor of
    the KPM Ā); ``a``/``b``/``c`` may be traced scalars."""
    offsets, mask, cg, sg = _site_tables(spec, cosh_b, sinh_b, reverse, sign)
    K, N = vkn.shape
    dt = vkn.dtype
    ones = jnp.ones((1, N), dt)
    pre2 = ones if pre is None else jnp.asarray(pre, dt).reshape(1, N)
    post2 = ones if post is None else jnp.asarray(post, dt).reshape(1, N)
    abc = jnp.stack([jnp.asarray(a, dt), jnp.asarray(b, dt),
                     jnp.asarray(c, dt)]).reshape(1, 3)
    use_prev = prev is not None
    # per-tile VMEM footprint: in/out (double-buffered ×2 each) + prev (×2)
    # + the vp/v temporaries — ~9 blocks with prev, ~7 without
    budget = 12 * 2 ** 20
    blocks = 9 if use_prev else 7
    tk_max = max(8, (budget // (blocks * 4 * N)) // 8 * 8)
    tk = min(tile_k, K, tk_max)
    grid = (pl.cdiv(K, tk),)
    G, n_off = offsets.shape
    in_specs = [
        pl.BlockSpec((G, n_off, N), lambda k: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3), lambda k: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((tk, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(mask, dt), cg.astype(dt), sg.astype(dt),
            pre2, post2, abc, vkn]
    if use_prev:
        in_specs.append(pl.BlockSpec((tk, N), lambda k: (k, 0),
                                     memory_space=pltpu.VMEM))
        args.append(prev)
    return pl.pallas_call(
        partial(_fold_fused_kernel, offsets=offsets, use_prev=use_prev),
        out_shape=jax.ShapeDtypeStruct((K, N), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tk, N), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def _to_2d(v):
    """[..., N, L] -> ([N, B·L], restore) moving batch axes into lanes."""
    lead = v.shape[:-2]
    N, L = v.shape[-2:]
    if not lead:
        return v, lambda y: y
    B = int(np.prod(lead))
    v2 = jnp.moveaxis(v.reshape((B, N, L)), 0, 1).reshape(N, B * L)

    def restore(y):
        return jnp.moveaxis(y.reshape(N, B, L), 1, 0).reshape(lead + (N, L))

    return v2, restore


def ckb_mul(spec: CheckerboardSpec, cosh_b, sinh_b, v):
    """Fused exp(−Δτ·K)·v (forward group order)."""
    v2, restore = _to_2d(jnp.asarray(v))
    return restore(fold_2d(spec, cosh_b, sinh_b, v2))


def ckb_transpose_mul(spec: CheckerboardSpec, cosh_b, sinh_b, v):
    v2, restore = _to_2d(jnp.asarray(v))
    return restore(fold_2d(spec, cosh_b, sinh_b, v2, reverse=True))


def ckb_inverse_mul(spec: CheckerboardSpec, cosh_b, sinh_b, v):
    v2, restore = _to_2d(jnp.asarray(v))
    return restore(fold_2d(spec, cosh_b, sinh_b, v2, reverse=True, sign=-1.0))


def ckb_inverse_transpose_mul(spec: CheckerboardSpec, cosh_b, sinh_b, v):
    v2, restore = _to_2d(jnp.asarray(v))
    return restore(fold_2d(spec, cosh_b, sinh_b, v2, sign=-1.0))
