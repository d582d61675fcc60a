"""Parallel tempering over the coupling ladder (dynamics/tempering.py —
beyond reference scope)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elphdynamics_tpu.dynamics.init_phonons import init_phonons_half_filled
from elphdynamics_tpu.dynamics.tempering import (TemperingConfig,
                                                 ladder_params,
                                                 make_exchange_step,
                                                 target_mask)
from elphdynamics_tpu.lattice import Lattice, UnitCell
from elphdynamics_tpu.models import holstein as H
from elphdynamics_tpu.models.adapter import make_model_ops


def _model(L=2, beta=2.0, lam=1.0):
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, L)
    spec, params = H.build_holstein(
        lat, beta=beta, dtau=0.1,
        t_assignments=[(1.0, 0.0, 0, 0, (1, 0, 0)),
                       (1.0, 0.0, 0, 0, (0, 1, 0))],
        omega=1.0, lam=lam, mu=0.0)
    return make_model_ops(spec), params


def _chains(ops, params, C, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), C)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0]
                    for k in keys])
    return xs, keys


def test_ladder_params_and_mask():
    ops, params = _model()
    tcfg = TemperingConfig(ladder=(1.0, 1.25, 1.5), freq=2)
    ps = ladder_params(params, tcfg, 6)
    lam = np.asarray(ps.lam)
    assert lam.shape[0] == 6
    np.testing.assert_allclose(lam[0], np.asarray(params.lam))
    np.testing.assert_allclose(lam[2], 1.25 * np.asarray(params.lam))
    np.testing.assert_allclose(lam[5], 1.5 * np.asarray(params.lam))
    m = target_mask(tcfg, 6)
    assert m.tolist() == [True, True, False, False, False, False]
    with pytest.raises(ValueError):
        ladder_params(params, tcfg, 5)
    with pytest.raises(ValueError):
        ladder_params(params, TemperingConfig(ladder=(1.1, 1.2)), 4)


def test_exchange_identical_rungs_always_accepts():
    """ladder = (1.0, 1.0): ΔS is solver-tolerance noise, so every pair
    must accept and the swap exchanges configurations exactly."""
    ops, params = _model()
    tcfg = TemperingConfig(ladder=(1.0, 1.0), freq=1, tol=1e-8)
    C = 4
    ps = ladder_params(params, tcfg, C)
    x, keys = _chains(ops, params, C)
    v = 0.1 * x
    ex = jax.jit(make_exchange_step(ops, tcfg, C),
                 static_argnames="parity")
    x2, v2, acc, iters, flag, keys2 = ex(ps, x, v, keys, parity=0)
    assert float(acc) == 1.0
    assert int(flag) == 0
    np.testing.assert_allclose(np.asarray(x2[:2]), np.asarray(x[2:]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(x2[2:]), np.asarray(x[:2]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(v2[:2]), np.asarray(v[2:]),
                               atol=1e-12)
    # odd parity with K=2: no complete pair, nothing moves
    x3, v3, acc3, _, _, _ = ex(ps, x, v, keys, parity=1)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), atol=1e-12)
    assert float(acc3) == 0.0


def test_exchange_three_rungs_parity_pairs():
    """K=3: parity 0 pairs (0,1), parity 1 pairs (1,2); rung boundaries
    never cross two rungs in one attempt."""
    ops, params = _model()
    tcfg = TemperingConfig(ladder=(1.0, 1.0, 1.0), freq=1, tol=1e-8)
    C = 3
    ps = ladder_params(params, tcfg, C)
    x, keys = _chains(ops, params, C)
    v = jnp.zeros_like(x)
    ex = jax.jit(make_exchange_step(ops, tcfg, C), static_argnames="parity")
    x2, _, acc, _, _, _ = ex(ps, x, v, keys, parity=0)
    np.testing.assert_allclose(np.asarray(x2[0]), np.asarray(x[1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x2[2]), np.asarray(x[2]), atol=1e-12)
    x3, _, acc3, _, _, _ = ex(ps, x, v, keys, parity=1)
    np.testing.assert_allclose(np.asarray(x3[0]), np.asarray(x[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(x3[1]), np.asarray(x[2]), atol=1e-12)


def test_exchange_distinct_rungs_metropolis_sane():
    """Distinct couplings: acceptance is in (0, 1] and a rejected pair
    keeps both configurations."""
    ops, params = _model(lam=1.2)
    tcfg = TemperingConfig(ladder=(1.0, 1.6), freq=1)
    C = 8
    ps = ladder_params(params, tcfg, C)
    x, keys = _chains(ops, params, C, seed=3)
    v = jnp.zeros_like(x)
    ex = jax.jit(make_exchange_step(ops, tcfg, C), static_argnames="parity")
    accs = []
    for s in range(6):
        x, v, acc, iters, flag, keys = ex(ps, x, v, keys, parity=0)
        assert int(flag) == 0
        accs.append(float(acc))
    assert 0.0 < np.mean(accs) <= 1.0


@pytest.mark.slow
def test_tempering_rung0_matches_ed():
    """2-rung tempering composed with vmapped HMC: rung-0 (physical λ)
    statistics must match the single-site ED ground truth — the exchange
    move must not bias the target distribution."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from ed_reference import single_site_holstein_ed
    from elphdynamics_tpu.dynamics.hmc import HMCConfig, HMCState, make_hmc_step
    from elphdynamics_tpu.ops.fourier_accel import build_mass

    BETA, OMEGA, LAM, MU = 2.0, 1.0, 1.0, -0.5
    uc = UnitCell.create(1, 1, [[1.0]], [[0.0]])
    lat = Lattice.create(uc, 1)
    spec, params = H.build_holstein(lat, beta=BETA, dtau=0.1,
                                    omega=OMEGA, lam=LAM, mu=MU)
    ops = make_model_ops(spec)
    tcfg = TemperingConfig(ladder=(1.0, 0.7), freq=2, tol=1e-6)
    C = 48  # 24 per rung
    ps = ladder_params(params, tcfg, C)
    mask = target_mask(tcfg, C)

    mass = build_mass(np.asarray(params.omega), ops.dtau, ops.Ltau,
                      [dict(omega_min=0.0, omega_max=10.0, mass=1.0)])
    cfg = HMCConfig(dt=0.05, trajectory_time=1.0, Nb=4, tol=1e-6, maxiter=500)
    step = make_hmc_step(ops, mass, cfg)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, 0)))
    ex = jax.jit(make_exchange_step(ops, tcfg, C), static_argnames="parity")

    keys = jax.random.split(jax.random.PRNGKey(5), C)
    xs = jnp.stack([init_phonons_half_filled(ops, params, k)[0]
                    for k in keys])
    st = HMCState(x=xs, v=jnp.zeros_like(xs))

    xh, exch_acc = [], []
    for n in range(380):
        st, stats, keys = vstep(ps, st, keys)
        if (n + 1) % tcfg.freq == 0:
            xn, vn, acc, _, fl, keys = ex(ps, st.x, st.v, keys,
                                          parity=(n // tcfg.freq) % 2)
            st = HMCState(x=xn, v=vn)
            exch_acc.append(float(acc))
        if n >= 80:
            xh.append(np.asarray(st.x)[mask])
    xh = np.concatenate(xh)
    ed = single_site_holstein_ed(BETA, OMEGA, LAM, MU)
    assert np.mean(exch_acc) > 0.05, np.mean(exch_acc)
    assert abs(xh.mean() - ed["x"]) < 0.05, (xh.mean(), ed["x"])
    assert abs((xh ** 2).mean() - ed["x2"]) < 0.06, ((xh ** 2).mean(), ed["x2"])


@pytest.mark.slow
def test_tempering_config_and_driver(tmp_path):
    """[tempering] end-to-end through the CLI driver: builds, runs, bins
    only rung-0 chains, logs the exchange acceptance."""
    import copy
    import os
    from elphdynamics_tpu.io.config import build_setup, load_toml
    from elphdynamics_tpu.simulation import _run

    cfg = load_toml(os.path.join(os.path.dirname(__file__), "..",
                                 "examples", "holstein_hmc_square.toml"))
    cfg = copy.deepcopy(cfg)
    cfg["lattice"]["L"] = 2
    cfg["holstein"]["beta"] = 1.0
    cfg["hmc"].update(burnin_updates=4, simulation_updates=8, meas_freq=2,
                      trajectory_time=0.5, dt=0.1, num_multitimesteps=2)
    cfg["simulation"].update(filepath=str(tmp_path), num_bins=2,
                             foldername="pt")
    cfg["measurements"]["num_random_vectors"] = 4
    cfg["tempering"] = {"ladder": [1.0, 1.4], "freq": 2}
    datafolder = str(tmp_path / "pt-1")
    os.makedirs(datafolder)
    setup = build_setup(cfg, datafolder)
    assert setup.tempering_cfg is not None
    stats = _run(setup, n_chains=4)
    assert 0.0 <= stats["tempering_acceptance_rate"] <= 1.0
    assert stats["acceptance_rate"] > 0.5
    # bins were written
    assert os.path.isdir(os.path.join(datafolder, "Greens_position_f"))
    # resume path: the checkpointed params are the stacked ladder — a
    # second _run must load them without re-stacking (shape regression)
    stats2 = _run(setup, n_chains=4)
    assert "tempering_acceptance_rate" in stats2


def test_exchange_ssh_identical_rungs():
    """SSH support: the ladder scales α, and identical rungs accept with
    probability exactly 1 (the φ-travels-with-x property is
    model-agnostic)."""
    from elphdynamics_tpu.models.ssh import build_ssh
    uc = UnitCell.create(2, 1, [[1.0, 0.0], [0.0, 1.0]], [[0.0, 0.0]])
    lat = Lattice.create(uc, 2)
    hop = dict(t=1.0, t_std=0.0, alpha=0.3, alpha_std=0.0,
               alpha2=0.0, alpha2_std=0.0, omega=0.5, omega_std=0.0,
               omega4=0.0, omega4_std=0.0, dL=(1, 0, 0), o1=0, o2=0,
               name="x")
    hop_y = dict(hop, dL=(0, 1, 0), name="y")
    spec, params = build_ssh(lat, beta=2.0, dtau=0.1,
                             hoppings=[hop, hop_y],
                             mu_assignments=[(0.0, 0.0, None)])
    ops = make_model_ops(spec)
    tcfg = TemperingConfig(ladder=(1.0, 1.0), freq=1, tol=1e-8)
    C = 2
    ps = ladder_params(params, tcfg, C)
    np.testing.assert_allclose(np.asarray(ps.alpha[1]),
                               np.asarray(params.alpha))
    x, keys = _chains(ops, params, C)
    v = jnp.zeros_like(x)
    ex = jax.jit(make_exchange_step(ops, tcfg, C), static_argnames="parity")
    x2, _, acc, _, flag, _ = ex(ps, x, v, keys, parity=0)
    assert float(acc) == 1.0 and int(flag) == 0
    np.testing.assert_allclose(np.asarray(x2[0]), np.asarray(x[1]),
                               atol=1e-12)

    # a scaled ladder really scales alpha
    tcfg2 = TemperingConfig(ladder=(1.0, 1.3), freq=1)
    ps2 = ladder_params(params, tcfg2, 2)
    np.testing.assert_allclose(np.asarray(ps2.alpha[1]),
                               1.3 * np.asarray(params.alpha))


@pytest.mark.slow
def test_tempering_under_chain_mesh(tmp_path):
    """[tempering] with --devices: per-rung params shard with the chains,
    the exchange's partner gathers run as XLA collectives across the mesh.
    Same seed ⇒ the 2-device run reproduces the single-device bins."""
    import copy
    import os
    from elphdynamics_tpu.io.config import build_setup, load_toml
    from elphdynamics_tpu.simulation import _run

    cfg0 = load_toml(os.path.join(os.path.dirname(__file__), "..",
                                  "examples", "holstein_hmc_square.toml"))
    cfg0 = copy.deepcopy(cfg0)
    cfg0["lattice"]["L"] = 2
    cfg0["holstein"]["beta"] = 1.0
    cfg0["hmc"].update(burnin_updates=4, simulation_updates=8, meas_freq=2,
                       trajectory_time=0.5, dt=0.1, num_multitimesteps=2)
    cfg0["measurements"]["num_random_vectors"] = 4
    cfg0["tempering"] = {"ladder": [1.0, 1.4], "freq": 2}
    # the stock example carries no random_seed (fresh entropy per run —
    # reference parity); parity across device counts needs a pinned one
    cfg0["simulation"]["random_seed"] = 7

    folders = {}
    for sub, nd in (("one", 1), ("mesh", 2)):
        cfg = copy.deepcopy(cfg0)
        cfg["simulation"].update(filepath=str(tmp_path / sub), num_bins=2,
                                 foldername="pt")
        datafolder = str(tmp_path / sub / "pt-1")
        os.makedirs(datafolder)
        setup = build_setup(cfg, datafolder)
        stats = _run(setup, n_chains=4, n_devices=nd)
        assert 0.0 <= stats["tempering_acceptance_rate"] <= 1.0
        folders[sub] = datafolder

    for b in (1, 2):
        f1 = os.path.join(folders["one"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        f2 = os.path.join(folders["mesh"], "global_measurements_f",
                          f"global_measurements_{b:05d}.out")
        g1 = {l.split()[0]: float(l.split()[1]) for l in open(f1)}
        g2 = {l.split()[0]: float(l.split()[1]) for l in open(f2)}
        for k in g1:
            assert abs(g1[k] - g2[k]) < 5e-6 * (1.0 + abs(g1[k])), \
                (b, k, g1[k], g2[k])
