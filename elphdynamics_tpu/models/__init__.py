from elphdynamics_tpu.models.holstein import HolsteinSpec, HolsteinParams, build_holstein
from elphdynamics_tpu.models.ssh import SSHSpec, SSHParams, build_ssh

__all__ = [
    "HolsteinSpec",
    "HolsteinParams",
    "build_holstein",
    "SSHSpec",
    "SSHParams",
    "build_ssh",
]
