"""Complex hopping (Peierls phases / twisted boundary conditions).

The reference is type-generic over complex matrix elements — ``Continuous =
Union{AbstractFloat,Complex}`` (Models.jl:20), ``conj(s)`` on the second
bond endpoint (Checkerboard.jl:78,116,137), complex ``Bond{T}``
(Models.jl:32-56). This exercises the TPU build's complex surface: the
Hermitian checkerboard tables, mulM / mulMT (≡ M†) / mulMTM (≡ M†M), the
dense expK fast path, and the Hermitian-inner-product CG
(utils/dtypes.fdot) — against independent dense numpy constructions at f64
(conftest enables x64) plus one f32/complex64 smoke test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops

from tests.dense_reference import dense_M, dense_expK, flatten_field


def _build(L=4, twist=(0.7, 0.3), dense_threshold=4096, dtype=None,
           beta=0.8, dtau=0.1):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    return H.build_holstein(
        lat, beta=beta, dtau=dtau,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=0.6, mu=0.0, twist=twist,
        dense_threshold=dense_threshold, dtype=dtype)


def test_twist_zero_keeps_real_dtype():
    spec0, p0 = _build(twist=None)
    specz, pz = _build(twist=(0.0, 0.0))
    assert not jnp.iscomplexobj(p0.cosht)
    assert not jnp.iscomplexobj(pz.cosht)
    np.testing.assert_array_equal(np.asarray(p0.sinht), np.asarray(pz.sinht))


@pytest.mark.parametrize("dense", [False, True])
def test_complex_expk_matches_dense_reference_and_is_hermitian(dense):
    spec, p = _build(dense_threshold=4096 if dense else 0)
    ckb = spec.ckb
    cosh_np = np.asarray(p.cosht)
    sinh_np = np.asarray(p.sinht)
    ref = dense_expK(spec.Nsites, ckb.neighbor_table, ckb.groups,
                     cosh_np, sinh_np)
    # nontrivially complex (each bond BLOCK is Hermitian; their ordered
    # product is not — hence the reversed-order fold IS the adjoint)
    assert np.abs(ref.imag).max() > 1e-3

    eye = np.eye(spec.Nsites, dtype=np.complex128)
    got = np.asarray(H.apply_expK(spec, p, jnp.asarray(eye)))
    # apply_expK acts on columns: got[:, j] = expK @ e_j ⇒ got == expK
    np.testing.assert_allclose(got, ref, atol=1e-12)
    gotT = np.asarray(H.apply_expK_T(spec, p, jnp.asarray(eye)))
    np.testing.assert_allclose(gotT, ref.conj().T, atol=1e-12)

    if not dense:
        # the inverse fold really inverts (c² − |s|² = 1 per block)
        from elphdynamics_tpu.ops.checkerboard import ckb_inverse_mul
        vin = jnp.asarray(
            np.random.default_rng(0).standard_normal((spec.Nsites, 3))
            + 1j * np.random.default_rng(1).standard_normal((spec.Nsites, 3)))
        back = ckb_inverse_mul(ckb, p.cosht, p.sinht,
                               H.apply_expK(spec, p, vin))
        np.testing.assert_allclose(np.asarray(back), np.asarray(vin),
                                   atol=1e-12)


def test_complex_mulM_and_adjoint_match_dense():
    spec, p = _build()
    rng = np.random.default_rng(2)
    x = 0.4 * rng.standard_normal((spec.Nsites, spec.Ltau))
    env = np.asarray(H.expnV(spec, p, jnp.asarray(x)))

    expK = dense_expK(spec.Nsites, spec.ckb.neighbor_table, spec.ckb.groups,
                      np.asarray(p.cosht), np.asarray(p.sinht))
    B = [expK @ np.diag(env[:, tau]) for tau in range(spec.Ltau)]
    Mref = dense_M(B)

    v = rng.standard_normal((spec.Nsites, spec.Ltau)) \
        + 1j * rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(H.mulM(spec, p, jnp.asarray(env), jnp.asarray(v)))
    np.testing.assert_allclose(flatten_field(got), Mref @ flatten_field(v),
                               atol=1e-12)
    # mulMT is the ADJOINT M† on the complex path
    gotT = np.asarray(H.mulMT(spec, p, jnp.asarray(env), jnp.asarray(v)))
    np.testing.assert_allclose(flatten_field(gotT),
                               Mref.conj().T @ flatten_field(v), atol=1e-12)
    # M†M agrees and is Hermitian positive definite in the Re⟨·,·⟩ sense
    gotN = np.asarray(H.mulMTM(spec, p, jnp.asarray(env), jnp.asarray(v)))
    np.testing.assert_allclose(
        flatten_field(gotN), Mref.conj().T @ (Mref @ flatten_field(v)),
        atol=1e-11)


def test_complex_cg_solves_hermitian_normal_equations():
    from elphdynamics_tpu.dynamics.solve import SolverConfig, solve_minv, solve_oinv

    spec, p = _build()
    ops = make_model_ops(spec)
    rng = np.random.default_rng(3)
    x = 0.4 * rng.standard_normal((spec.Nsites, spec.Ltau))
    env = ops.derived(p, jnp.asarray(x))
    rhs = jnp.asarray(rng.standard_normal((2, spec.Nsites, spec.Ltau))
                      + 1j * rng.standard_normal((2, spec.Nsites, spec.Ltau)))
    scfg = SolverConfig(tol=1e-9, maxiter=3000)
    res = solve_oinv(ops, p, env, rhs, scfg, None)
    assert int(res.flag.max()) == 0
    r = ops.mulMTM(p, env, res.x) - rhs
    rel = float(jnp.sqrt(jnp.sum(jnp.abs(r) ** 2))
                / jnp.sqrt(jnp.sum(jnp.abs(rhs) ** 2)))
    assert rel < 1e-8, rel

    res2 = solve_minv(ops, p, env, rhs, scfg, None)
    assert int(res2.flag.max()) == 0
    r2 = ops.mulM(p, env, res2.x) - rhs
    rel2 = float(jnp.sqrt(jnp.sum(jnp.abs(r2) ** 2))
                 / jnp.sqrt(jnp.sum(jnp.abs(rhs) ** 2)))
    assert rel2 < 1e-8, rel2


def test_complex_f32_smoke():
    """complex64 path: dense-mode operators + CG to f32-appropriate tol."""
    from elphdynamics_tpu.dynamics.solve import SolverConfig, solve_oinv

    spec, p = _build(dtype=jnp.float32)
    assert p.cosht.dtype == jnp.complex64
    ops = make_model_ops(spec)
    rng = np.random.default_rng(4)
    x = jnp.asarray(0.4 * rng.standard_normal((spec.Nsites, spec.Ltau)),
                    jnp.float32)
    env = ops.derived(p, x)
    rhs = jnp.asarray((rng.standard_normal((2, spec.Nsites, spec.Ltau))
                       + 1j * rng.standard_normal(
                           (2, spec.Nsites, spec.Ltau))), jnp.complex64)
    res = solve_oinv(ops, p, env, rhs, SolverConfig(tol=1e-4, maxiter=2000),
                     None)
    assert int(res.flag.max()) == 0
    assert float(res.residual.max()) < 3e-2  # sqrt-tol verification ball
