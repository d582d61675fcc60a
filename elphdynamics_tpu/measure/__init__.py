from elphdynamics_tpu.measure.greens import GreensData, sample_greens, pair_tensor_sums
from elphdynamics_tpu.measure.measurements import (
    MeasurementSpec,
    make_measurement_step,
    zero_container,
    process_bin,
)

__all__ = [
    "GreensData",
    "sample_greens",
    "pair_tensor_sums",
    "MeasurementSpec",
    "make_measurement_step",
    "zero_container",
    "process_bin",
]
