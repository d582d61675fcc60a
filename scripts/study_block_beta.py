"""Block-CG iteration study at deep β (CPU-valid: iteration counts are
platform-independent; the wall-time A/B lives in scripts/bench_block.py).

Equilibrates Holstein L×L at β (study_deep_beta harness), then solves the
measurement-stage estimator systems (nᵥ random vectors, MᵀM z = Mᵀr,
GreensFunctions.jl:201-234) through the PRODUCTION path (`solve_minv`)
with `[solver] block` off vs on. The deep-β spectrum has a handful of
near-null modes that rotate with the field (BASELINE.md §deep-β —
persistent deflation fails for exactly that reason); block CG deflates
them from the CURRENT operator's own Krylov block, so the iteration gap
should widen with β.

Run from the repo root:
    python scripts/study_block_beta.py [beta] [L] [nv] [max_order]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.dynamics.solve import (SolverConfig, resolve_precond,
                                             solve_minv)
from elphdynamics_tpu.ops import kpm

from study_deep_beta import equilibrate  # noqa: E402 (same harness)


def main():
    beta = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nv = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    max_order = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    ops, params, x = equilibrate(L, beta)
    derived = ops.derived(params, x)
    precond = kpm.make_symmetric_precond(ops, kpm.KPMConfig(max_order=max_order))

    R = jax.random.normal(jax.random.PRNGKey(7),
                          (nv, ops.Nsites, ops.Ltau), x.dtype)

    for block in (False, True):
        scfg = SolverConfig(tol=1e-5, maxiter=4000, kind="cg", block=block)

        def go(x, R):
            pa = resolve_precond(precond, params, x)
            return solve_minv(ops, params, derived, R, scfg, pa, block=True)

        res = jax.jit(go)(x, R)
        it = np.asarray(res.iters)
        print(f"block={str(block):>5}: iters/solve mean {it.mean():7.1f} "
              f"max {int(it.max()):4d}  maxflag {int(np.max(np.asarray(res.flag)))}",
              flush=True)
        if block:
            ratio = it.mean() / base
        else:
            base = it.mean()
    print(f"\nbeta={beta} L={L} nv={nv} cheb{max_order}: "
          f"block/batched iteration ratio {ratio:.2f}", flush=True)

    # --- trajectory-style solve: the spin-stacked [2, N, Lτ] system of
    # solve_oinv (HMC.jl:820-915) shares the operator across spins, so a
    # s=2 block costs zero extra matvecs. How much does deflating ONE slow
    # mode save at this β?
    from elphdynamics_tpu import solvers

    phi = ops.mulMT(params, derived,
                    jax.random.normal(jax.random.PRNGKey(9),
                                      (2, ops.Nsites, ops.Ltau), x.dtype))
    pa = resolve_precond(precond, params, x)
    A = lambda v: ops.mulMTM(params, derived, v)
    for label, fn in [
        ("spin-pair batched", lambda: solvers.cg(
            A, phi, apply_P=pa.symmetric, tol=1e-5, maxiter=4000)),
        ("spin-pair block s=2", lambda: solvers.block_cg(
            A, phi, apply_P=pa.symmetric, tol=1e-5, maxiter=4000)),
    ]:
        res = jax.jit(fn)()
        it = np.asarray(res.iters)
        print(f"{label:>22}: iters mean {it.mean():7.1f} max {int(it.max()):4d}",
              flush=True)


if __name__ == "__main__":
    main()
