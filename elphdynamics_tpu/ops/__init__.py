from elphdynamics_tpu.ops.checkerboard import (
    CheckerboardSpec,
    checkerboard_groups,
    build_checkerboard_spec,
    ckb_mul,
    ckb_transpose_mul,
    ckb_inverse_mul,
    ckb_inverse_transpose_mul,
    ckb_matrix,
)

__all__ = [
    "CheckerboardSpec",
    "checkerboard_groups",
    "build_checkerboard_spec",
    "ckb_mul",
    "ckb_transpose_mul",
    "ckb_inverse_mul",
    "ckb_inverse_transpose_mul",
    "ckb_matrix",
]
