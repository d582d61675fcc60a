from elphdynamics_tpu.dynamics.langevin import make_langevin_step
from elphdynamics_tpu.dynamics.hmc import make_hmc_step, HMCConfig

__all__ = ["make_langevin_step", "make_hmc_step", "HMCConfig"]
