import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from dense_reference import dense_expK, dense_M


def make_model(L=3, Ltau=4, lam=0.7, lam2=0.15, mu=-0.2, seed=0):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=Ltau * 0.1, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)), (1.0, 0.0, 0, 0, (0, 1, 0))],
        mu=mu, omega=1.0, lam=lam, lam2=lam2, omega4=0.3,
        rng=np.random.default_rng(seed),
    )
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.standard_normal((spec.Nph, spec.Ltau)))
    return spec, params, x


def dense_model_M(spec, params, x):
    env = np.asarray(H.expnV(spec, params, x))
    expK = dense_expK(
        spec.ckb.nsites, spec.ckb.neighbor_table, spec.ckb.groups,
        np.asarray(params.cosht), np.asarray(params.sinht),
    )
    B = [expK @ np.diag(env[:, tau]) for tau in range(spec.Ltau)]
    return dense_M(B)


def test_mulM_matches_dense():
    spec, params, x = make_model()
    env = H.expnV(spec, params, x)
    M = dense_model_M(spec, params, x)
    rng = np.random.default_rng(7)
    v = rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(H.mulM(spec, params, env, v)).reshape(-1)
    want = M @ v.reshape(-1)
    assert np.allclose(got, want, atol=1e-12)


def test_mulMT_matches_dense():
    spec, params, x = make_model()
    env = H.expnV(spec, params, x)
    M = dense_model_M(spec, params, x)
    rng = np.random.default_rng(8)
    v = rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(H.mulMT(spec, params, env, v)).reshape(-1)
    want = M.T @ v.reshape(-1)
    assert np.allclose(got, want, atol=1e-12)


def test_mulMTM_and_MMT():
    spec, params, x = make_model()
    env = H.expnV(spec, params, x)
    M = dense_model_M(spec, params, x)
    rng = np.random.default_rng(9)
    v = rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(H.mulMTM(spec, params, env, v)).reshape(-1)
    assert np.allclose(got, M.T @ (M @ v.reshape(-1)), atol=1e-11)
    got = np.asarray(H.mulMMT(spec, params, env, v)).reshape(-1)
    assert np.allclose(got, M @ (M.T @ v.reshape(-1)), atol=1e-11)


def test_muldMdx_finite_difference():
    """dMdx(i,τ) = uᵀ·[∂M/∂x_i(τ)]·v via central differences on uᵀMv."""
    spec, params, x = make_model(L=2, Ltau=3)
    rng = np.random.default_rng(10)
    u = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    v = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    env = H.expnV(spec, params, x)
    got = np.asarray(H.muldMdx(spec, params, env, x, u, v))

    def uMv(xx):
        ee = H.expnV(spec, params, xx)
        return jnp.sum(u * H.mulM(spec, params, ee, v))

    # autodiff cross-check (exact)
    want = np.asarray(jax.grad(uMv)(x))
    assert np.allclose(got, want, atol=1e-10)

    h = 1e-6
    xn = np.asarray(x)
    for i in range(spec.Nsites):
        for tau in range(spec.Ltau):
            xp = xn.copy(); xp[i, tau] += h
            xm = xn.copy(); xm[i, tau] -= h
            fd = (uMv(jnp.asarray(xp)) - uMv(jnp.asarray(xm))) / (2 * h)
            assert abs(got[i, tau] - fd) < 1e-5


def test_Sb_gradient():
    spec, params, x = make_model()
    for shifted in (False, True):
        got = np.asarray(H.calc_dSbdx(spec, params, x, shifted))
        want = np.asarray(jax.grad(lambda xx: H.calc_Sb(spec, params, xx, shifted))(x))
        assert np.allclose(got, want, atol=1e-11)


def test_Sb_dispersive_gradient():
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 4)
    spec, params = H.build_holstein(
        lat, beta=0.4, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.5,
        wij_assignments=[(0.3, 0.0, -1, 0, 0, (1, 0, 0))],
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((spec.Nph, spec.Ltau)))
    got = np.asarray(H.calc_dSbdx(spec, params, x))
    want = np.asarray(jax.grad(lambda xx: H.calc_Sb(spec, params, xx))(x))
    assert np.allclose(got, want, atol=1e-11)


def test_lambda_operator_identities():
    """Λ⁻¹(Λ v) = v and ⟨vl|dΛ/dx|vr⟩ matches autodiff of vlᵀΛ(x)vr."""
    spec, params, x = make_model(L=2, Ltau=4)
    Lam = H.calc_Lambda(spec, params, x)
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    w = H.mulLambda(spec, Lam, v)
    back = H.mulLambdaInv(spec, Lam, w)
    assert np.allclose(back, v, atol=1e-12)

    vl = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    vr = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))

    # reference semantics (HMC.jl:1005-1025): ⟨vl|∂Λᵀ/∂x|vr⟩, i.e. the
    # gradient of vrᵀ·Λop·vl where Λop is the mulLambda operator
    def f(xx):
        return jnp.sum(vr * H.mulLambda(spec, H.calc_Lambda(spec, params, xx), vl))

    want = np.asarray(jax.grad(f)(x))
    got = np.asarray(H.muldLambdadx(spec, params, x, Lam, vl, vr))
    assert np.allclose(got, want, atol=1e-10)


def test_single_site_M_exact():
    """Single site, no hopping: M is the dense bidiagonal antiperiodic matrix."""
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(lat, beta=0.4, dtau=0.1, omega=1.0, lam=1.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4)))
    env = H.expnV(spec, params, x)
    M = dense_model_M(spec, params, x)
    v = np.random.default_rng(1).standard_normal((1, 4))
    got = np.asarray(H.mulM(spec, params, env, v)).reshape(-1)
    assert np.allclose(got, M @ v.reshape(-1), atol=1e-13)
