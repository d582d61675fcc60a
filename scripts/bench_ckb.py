"""Microbenchmark: checkerboard application strategies on real TPU.

Measures exp(−Δτ·K)·v per-application wall time for
  * dense MXU matmul ([N,N] constant matrix),
  * XLA group fold (ngroups gather+FMA passes),
  * fused Pallas fold (one VMEM-resident pass),
across lattice sizes, to locate the dense↔fold crossover (BASELINE.md,
VERDICT r1 next-step #9).

Run: python scripts/bench_ckb.py   (on the TPU chip; CPU works but is not
the regime of interest).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models.holstein import build_holstein
from elphdynamics_tpu.ops import checkerboard as ckb
from elphdynamics_tpu.ops import ckb_pallas


def build(L):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = build_holstein(
        lat, beta=4.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=1.0, mu=0.0, dtype=jnp.float32,
        dense_threshold=10 ** 9)
    return spec, params


INNER = 100  # applications per jitted call — amortizes dispatch latency


def chain(fn):
    """Wrap an apply into a jitted INNER-fold loop so per-call dispatch
    latency (significant through the axon tunnel) is amortized away."""

    @jax.jit
    def run(*args):
        v = args[-1]

        def body(_, v):
            return fn(*args[:-1], v)

        return jax.lax.fori_loop(0, INNER, body, v)

    return run


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * INNER)


def main():
    K = 320  # Lτ=40 × 8 batched systems (spin/random-vector lanes)
    print(f"device={jax.devices()[0]}  K={K}")
    print(f"{'L':>4} {'N':>6} {'dense_ms':>9} {'fold_ms':>9} {'pallas_ms':>10} "
          f"{'pallas_ok':>9}")
    for L in (8, 16, 32, 64):
        spec, params = build(L)
        N = spec.Nsites
        v = jax.random.normal(jax.random.PRNGKey(0), (N, K), dtype=jnp.float32)
        expK = jnp.asarray(ckb.dense_matrix(spec.ckb, np.asarray(params.cosht),
                                            np.asarray(params.sinht)),
                           jnp.float32)

        dense = chain(lambda M, x: jnp.einsum(
            "ij,jk->ik", M, x, precision=jax.lax.Precision.HIGHEST))
        fold = chain(lambda c, s, x: ckb.ckb_mul(spec.ckb, c, s, x))
        t_dense = timeit(dense, expK, v)
        t_fold = timeit(fold, params.cosht, params.sinht, v)

        try:
            pfold = chain(lambda c, s, x: ckb_pallas.fold_2d(spec.ckb, c, s, x))
            got = np.asarray(jax.jit(
                lambda c, s, x: ckb_pallas.fold_2d(spec.ckb, c, s, x))(
                    params.cosht, params.sinht, v))
            ref = np.asarray(jax.jit(
                lambda c, s, x: ckb.ckb_mul(spec.ckb, c, s, x))(
                    params.cosht, params.sinht, v))
            ok = np.allclose(got, ref, atol=1e-4, rtol=1e-4)
            t_pallas = timeit(pfold, params.cosht, params.sinht, v)
        except Exception as e:  # lowering not supported → report, keep going
            ok = False
            t_pallas = float("nan")
            print(f"  pallas failed at L={L}: {type(e).__name__}: {str(e)[:120]}")
        print(f"{L:>4} {N:>6} {t_dense*1e3:>9.3f} {t_fold*1e3:>9.3f} "
              f"{t_pallas*1e3:>10.3f} {str(ok):>9}")


if __name__ == "__main__":
    main()
