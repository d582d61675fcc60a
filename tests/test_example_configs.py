"""All shipped example configs must parse and build (the reference's 8
config exemplars, SURVEY §2)."""

import glob
import os

import pytest

from elphdynamics_tpu.io.config import build_setup, load_toml

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                         "examples", "*.toml")))


def test_eight_examples_present():
    names = {os.path.basename(p) for p in EXAMPLES}
    assert names == {
        "holstein_hmc_honeycomb.toml", "holstein_hmc_single_site.toml",
        "holstein_hmc_square.toml", "holstein_hmc_triangular.toml",
        "holstein_langevin_square.toml", "ssh_hmc_square.toml",
        "ssh_hmc_two_site.toml", "ssh_langevin_square.toml",
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
