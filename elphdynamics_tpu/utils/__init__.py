from elphdynamics_tpu.utils.dtypes import default_real_dtype, set_x64
from elphdynamics_tpu.utils.math import simpson

__all__ = ["default_real_dtype", "set_x64", "simpson"]
