import jax
import jax.numpy as jnp
import numpy as np

from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import ssh as S
from dense_reference import dense_expK, dense_M


def make_chain_model(L=4, Ltau=4, alpha=0.4, alpha2=0.1, mu=-0.3, seed=0):
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, L)
    spec, params = S.build_ssh(
        lat, beta=Ltau * 0.1, dtau=0.1,
        hoppings=[dict(t=1.0, omega=1.0, alpha=alpha, alpha2=alpha2,
                       o1=0, o2=0, dL=(1, 0, 0), name="ph")],
        mu_assignments=[(mu, 0.0, None)],
        rng=np.random.default_rng(seed),
    )
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(0.3 * rng.standard_normal((spec.Nph, spec.Ltau)))
    x = S.tie_fields(spec, x)
    return spec, params, x


def dense_model_M(spec, params, x):
    coeffs = S.ckb_coeffs(spec, params, x)
    cB = np.asarray(coeffs[0])
    sB = np.asarray(coeffs[1])
    emu = np.asarray(S.exp_mu(spec, params))[:, 0]
    Bs = []
    for tau in range(spec.Ltau):
        expK = dense_expK(spec.Nsites, spec.ckb.neighbor_table, spec.ckb.groups,
                          cB[:, tau], sB[:, tau])
        Bs.append(expK @ np.diag(emu))
    return dense_M(Bs)


def test_mulM_matches_dense():
    spec, params, x = make_chain_model()
    coeffs = S.ckb_coeffs(spec, params, x)
    M = dense_model_M(spec, params, x)
    rng = np.random.default_rng(7)
    v = rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(S.mulM(spec, params, coeffs, v)).reshape(-1)
    assert np.allclose(got, M @ v.reshape(-1), atol=1e-12)


def test_mulMT_matches_dense():
    spec, params, x = make_chain_model()
    coeffs = S.ckb_coeffs(spec, params, x)
    M = dense_model_M(spec, params, x)
    rng = np.random.default_rng(8)
    v = rng.standard_normal((spec.Nsites, spec.Ltau))
    got = np.asarray(S.mulMT(spec, params, coeffs, v)).reshape(-1)
    assert np.allclose(got, M.T @ v.reshape(-1), atol=1e-12)


def test_muldMdx_autodiff():
    """The group-fold muldMdx equals the gradient of uᵀM(x)v.

    Note: the reference's dK/dx = α + 2α₂x (SSHModels.jl:809) drops the
    sign(x) factor of the α₂ term, so for this check the quadratic coupling
    is set to zero (where the formula is exact)."""
    spec, params, x = make_chain_model(alpha2=0.0)
    coeffs = S.ckb_coeffs(spec, params, x)
    rng = np.random.default_rng(10)
    u = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    v = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    got = np.asarray(S.muldMdx(spec, params, coeffs, x, u, v))

    def uMv(xx):
        cc = S.ckb_coeffs(spec, params, xx)
        return jnp.sum(u * S.mulM(spec, params, cc, v))

    want = np.asarray(jax.grad(uMv)(x))
    assert np.allclose(got, want, atol=1e-10)


def test_muldMdx_matches_reference_formula_quadratic():
    """With α₂ ≠ 0 the implementation must reproduce the reference's
    dK/dx = α + 2α₂x convention exactly (finite-difference of a matrix
    built with that convention)."""
    spec, params, x = make_chain_model(alpha2=0.2)
    coeffs = S.ckb_coeffs(spec, params, x)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    v = jnp.asarray(rng.standard_normal((spec.Nsites, spec.Ltau)))
    got = np.asarray(S.muldMdx(spec, params, coeffs, x, u, v))

    # independent evaluation: chain rule through t' with the reference's
    # d(t')/dx = -(α + 2α₂x) convention
    def uMv_of_tprime(tp):
        tp_ckb = jnp.take(tp, jnp.asarray(spec.ckb_to_bond), axis=-2)
        cc = (jnp.cosh(spec.dtau * tp_ckb), jnp.sinh(spec.dtau * tp_ckb))
        return jnp.sum(u * S.mulM(spec, params, cc, v))

    tp = S.hopping_t_prime(spec, params, x)
    g_tp = np.asarray(jax.grad(uMv_of_tprime)(tp))  # [Nbonds, Ltau]
    btp = np.maximum(spec.bond_to_phonon, 0)
    dtpdx = -(np.asarray(params.alpha)[btp][:, None]
              + 2 * np.asarray(params.alpha2)[btp][:, None] * np.asarray(x)[btp])
    has = (spec.bond_to_phonon >= 0)[:, None]
    contrib = np.where(has, g_tp * dtpdx, 0.0)
    want = np.zeros((spec.Nph, spec.Ltau))
    for b in range(spec.Nbonds):
        ph = spec.bond_to_phonon[b]
        if ph >= 0:
            want[ph] += contrib[b]
    # primary tying
    tied = np.zeros_like(want)
    for p_ in range(spec.Nph):
        tied[spec.primary_phonon[p_]] += want[p_]
    want = tied[spec.primary_phonon]
    assert np.allclose(got, want, atol=1e-10)


def test_Sb_gradient():
    spec, params, x = make_chain_model()
    got = np.asarray(S.calc_dSbdx(spec, params, x))
    want = np.asarray(jax.grad(lambda xx: S.calc_Sb(spec, params, xx))(x))
    # gradients agree on primary fields (Sb counts primaries only; with no
    # aliasing every field is primary)
    assert np.all(spec.primary_phonon == np.arange(spec.Nph))
    assert np.allclose(got, want, atol=1e-11)


def test_primary_field_tying():
    """Two same-named hopping definitions alias their phonons."""
    uc = UnitCell.create(1, 2, [[1.0]], [[0.0], [0.5]])
    lat = Lattice.create(uc, 3)
    h = dict(t=1.0, omega=1.0, alpha=0.3, name="shared")
    spec, params = S.build_ssh(
        lat, beta=0.4, dtau=0.1,
        hoppings=[dict(h, o1=0, o2=1, dL=(0, 0, 0)),
                  dict(h, o1=1, o2=0, dL=(1, 0, 0))],
        mu_assignments=[(0.0, 0.0, None)],
    )
    assert spec.Nph == 6
    assert np.all(spec.primary_phonon[:3] == np.arange(3))
    assert np.all(spec.primary_phonon[3:] == np.arange(3))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((spec.Nph, spec.Ltau)))
    xt = np.asarray(S.tie_fields(spec, x))
    assert np.allclose(xt[3:], xt[:3])
