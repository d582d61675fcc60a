from elphdynamics_tpu.io.config import SimulationParams, build_setup, load_toml

__all__ = ["SimulationParams", "build_setup", "load_toml"]
