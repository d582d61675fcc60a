"""All shipped example configs must parse and build (the reference's 8
config exemplars, SURVEY §2)."""

import glob
import os

import pytest

from elphdynamics_tpu.io.config import build_setup, load_toml

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                         "examples", "*.toml")))


def test_examples_present():
    """The reference's 8 exemplars plus the deep-β and twisted-BC recipes
    (BASELINE.md; docs/configuration.md)."""
    names = {os.path.basename(p) for p in EXAMPLES}
    assert names == {
        "holstein_hmc_honeycomb.toml", "holstein_hmc_single_site.toml",
        "holstein_hmc_square.toml", "holstein_hmc_triangular.toml",
        "holstein_langevin_square.toml", "ssh_hmc_square.toml",
        "ssh_hmc_two_site.toml", "ssh_langevin_square.toml",
        "holstein_hmc_deep_beta.toml", "holstein_hmc_twisted.toml",
        "ssh_hmc_twisted.toml",
    }


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_builds(path, tmp_path):
    cfg = load_toml(path)
    setup = build_setup(cfg, str(tmp_path / "df"))
    assert setup.ops.Nsites >= 1
    assert setup.dynamics_type in ("hmc", "langevin")
    assert setup.mspec.nv >= 2
    # honeycomb exercises the multi-orbital path
    if "honeycomb" in path:
        assert setup.ops.spec.lattice.unit_cell.norbits == 2


def test_preconditioner_schema_knobs():
    """All [solver.preconditioner] knobs reach KPMConfig — incl. the
    beyond-reference exact_lowfreq hybrid (unwired-feature regression)."""
    import copy

    from elphdynamics_tpu.io.config import build_setup
    from test_simulation_driver import BASE_CFG

    cfg = copy.deepcopy(BASE_CFG)
    cfg["solver"]["preconditioner"] = {
        "n": 12, "buf": 0.07, "c1": 2.0, "c2": 3.0, "max_order": 16,
        "dft_matmul": True, "stacked": False, "exact_lowfreq": 6,
    }
    setup = build_setup(cfg, "/tmp/_schema_check")
    k = setup.kpm_cfg
    assert (k.n_power, k.buf, k.c1, k.c2) == (12, 0.07, 2.0, 3.0)
    assert k.max_order == 16 and k.dft_matmul is True
    assert k.exact_lowfreq == 6


def test_omega_ij_toml_wiring(tmp_path):
    """[[holstein.omega_ij]] reaches the model (the reference implements
    assign_omega_ij! (HolsteinModels.jl:449-464) but never wires it from
    the TOML; wired for real here)."""
    import copy
    cfg = load_toml(os.path.join(os.path.dirname(__file__), "..",
                                 "examples", "holstein_hmc_square.toml"))
    cfg = copy.deepcopy(cfg)
    cfg["holstein"]["omega_ij"] = [
        {"val": 0.3, "sign": -1, "orbit": [1, 1], "dL": [1, 0, 0]},
    ]
    setup = build_setup(cfg, str(tmp_path / "df"))
    assert setup.ops.spec.wij_table.shape[1] > 0
    assert float(setup.params.wij[0]) == 0.3
    # the dispersive action term must actually contribute
    import jax.numpy as jnp
    import numpy as np
    x = jnp.ones((setup.ops.Nph, setup.ops.Ltau))
    cfg2 = copy.deepcopy(cfg)
    del cfg2["holstein"]["omega_ij"]
    setup2 = build_setup(cfg2, str(tmp_path / "df2"))
    Sb_with = float(setup.ops.calc_Sb(setup.params, x, False))
    Sb_without = float(setup2.ops.calc_Sb(setup2.params, x, False))
    # sign=-1 couples (xi - xj)^2 which vanishes on a uniform field;
    # a random field must shift the action
    key = np.random.default_rng(0)
    xr = jnp.asarray(key.standard_normal((setup.ops.Nph, setup.ops.Ltau)))
    d = float(setup.ops.calc_Sb(setup.params, xr, False)) - \
        float(setup2.ops.calc_Sb(setup2.params, xr, False))
    assert Sb_with == Sb_without  # uniform field: (xi-xj)^2 = 0
    assert abs(d) > 1e-3
