"""HMC through the non-CG solver path + KPM self-deactivation behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops
from elphdynamics_tpu.ops import kpm
from elphdynamics_tpu.ops.fourier_accel import build_mass

FA = [dict(omega_min=0.0, omega_max=10.0, mass=1.0)]


def make_model():
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 3)
    spec, params = H.build_holstein(
        lat, beta=1.0, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0))],
        omega=1.0, lam=0.6, mu=-0.2,
    )
    return make_model_ops(spec), spec, params


@pytest.mark.slow
def test_hmc_bicgstab_energy_conservation():
    """A fine leapfrog must conserve H through the BiCGStab O⁻¹ path
    (two sequential M-solves with Left/Right KPM, HMC.jl:859-903)."""
    ops, spec, params = make_model()
    mass = build_mass(np.asarray(params.omega), spec.dtau, spec.Ltau, FA)
    precond = kpm.make_precond(ops, kpm.KPMConfig(max_order=48, c1=4.0, c2=4.0))
    cfg = HMCConfig(dt=0.002, trajectory_time=0.02, Nb=1, tol=1e-8, maxiter=3000,
                    solver_kind="bicgstab")
    step = jax.jit(make_hmc_step(ops, mass, cfg, precond))
    key = jax.random.PRNGKey(0)
    x, key = init_phonons_half_filled(ops, params, key)
    state = HMCState(x=x, v=jnp.zeros_like(x))
    for _ in range(2):
        state, stats, key = step(params, state, key)
        assert int(stats.flag) == 0
        assert abs(float(stats.delta_H)) < 1e-3, float(stats.delta_H)
        assert bool(stats.accepted)


def test_kpm_self_deactivates_on_bad_spectrum():
    """With a huge phonon field the averaged operator's spectrum leaves the
    validity window (KPMPreconditioners.jl:280-318); the preconditioner must
    deactivate and behave as the identity."""
    ops, spec, params = make_model()
    x_bad = 50.0 * jnp.ones((spec.Nph, spec.Ltau))
    st = kpm.setup(ops, params, x_bad, kpm.KPMConfig(), jax.random.PRNGKey(0))
    assert not bool(st.active)
    v = jnp.asarray(np.random.default_rng(0).standard_normal((spec.Nsites, spec.Ltau)))
    out = kpm.apply_symmetric(ops, st, v)
    assert np.allclose(np.asarray(out), np.asarray(v))
