"""Uniform functional interface over the model families.

The samplers (Langevin, HMC, special updates) and estimators are written
against this small protocol rather than a concrete model, mirroring the role
of the reference's ``AbstractModel`` dispatch (Models.jl:65,192-238) — but as
a bundle of pure closures over the static spec, with dynamic parameters
passed explicitly so they remain differentiable/updatable (μ-tuning).

``derived(params, x)`` plays the role of the reference's mutated caches
(``expnΔτV`` for Holstein, per-(τ,bond) cosh/sinh for SSH): it is recomputed
inside every jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


from elphdynamics_tpu.models import holstein as Hm
from elphdynamics_tpu.models import ssh as Sm


@dataclass(frozen=True)
class ModelOps:
    spec: Any
    Nsites: int
    Nph: int
    Ltau: int
    dtau: float
    beta: float
    is_holstein: bool
    # derived state
    derived: Callable  # (params, x) -> env/coeffs
    # fermion matrix action, all (params, derived, v)
    mulM: Callable
    mulMT: Callable
    mulMTM: Callable
    mulMMT: Callable
    # (params, derived, x, u, v) -> [Nph, Ltau]
    muldMdx: Callable
    # bosonic action
    calc_Sb: Callable    # (params, x, shifted=False) -> scalar
    calc_dSbdx: Callable  # (params, x, shifted=False) -> [Nph, Ltau]
    # noise tying for aliased fields (identity for Holstein)
    tie: Callable  # (v) -> v
    # Λ exponential-shift operators (None for SSH — identity semantics)
    calc_Lambda: Callable | None = None
    mulLambda: Callable | None = None
    mulLambdaInv: Callable | None = None
    muldLambdadx: Callable | None = None

    def __hash__(self):
        return hash(self.spec)


def make_model_ops(spec) -> ModelOps:
    if isinstance(spec, Hm.HolsteinSpec):
        return ModelOps(
            spec=spec,
            Nsites=spec.Nsites,
            Nph=spec.Nph,
            Ltau=spec.Ltau,
            dtau=spec.dtau,
            beta=spec.beta,
            is_holstein=True,
            derived=lambda p, x: Hm.expnV(spec, p, x),
            # ``precision`` selects the dense-mode matmul pass count for the
            # split in-loop/verification policy (models/holstein.apply_expK)
            mulM=lambda p, d, v, precision=None: Hm.mulM(spec, p, d, v, precision),
            mulMT=lambda p, d, v, precision=None: Hm.mulMT(spec, p, d, v, precision),
            mulMTM=lambda p, d, v, precision=None: Hm.mulMTM(spec, p, d, v, precision),
            mulMMT=lambda p, d, v, precision=None: Hm.mulMMT(spec, p, d, v, precision),
            muldMdx=lambda p, d, x, u, v: Hm.muldMdx(spec, p, d, x, u, v),
            calc_Sb=lambda p, x, shifted=False: Hm.calc_Sb(spec, p, x, shifted),
            calc_dSbdx=lambda p, x, shifted=False: Hm.calc_dSbdx(spec, p, x, shifted),
            tie=lambda v: v,
            calc_Lambda=lambda p, x: Hm.calc_Lambda(spec, p, x),
            mulLambda=lambda Lam, v: Hm.mulLambda(spec, Lam, v),
            mulLambdaInv=lambda Lam, v: Hm.mulLambdaInv(spec, Lam, v),
            muldLambdadx=lambda p, x, Lam, vl, vr: Hm.muldLambdadx(spec, p, x, Lam, vl, vr),
        )
    if isinstance(spec, Sm.SSHSpec):
        return ModelOps(
            spec=spec,
            Nsites=spec.Nsites,
            Nph=spec.Nph,
            Ltau=spec.Ltau,
            dtau=spec.dtau,
            beta=spec.beta,
            is_holstein=False,
            derived=lambda p, x: Sm.ckb_coeffs(spec, p, x),
            # SSH's fermion apply is the gather+FMA checkerboard fold — full
            # f32 on the VPU with no matmul to down-precision, so the
            # ``precision`` knob is accepted for interface parity and ignored
            mulM=lambda p, d, v, precision=None: Sm.mulM(spec, p, d, v),
            mulMT=lambda p, d, v, precision=None: Sm.mulMT(spec, p, d, v),
            mulMTM=lambda p, d, v, precision=None: Sm.mulMTM(spec, p, d, v),
            mulMMT=lambda p, d, v, precision=None: Sm.mulMMT(spec, p, d, v),
            muldMdx=lambda p, d, x, u, v: Sm.muldMdx(spec, p, d, x, u, v),
            calc_Sb=lambda p, x, shifted=False: Sm.calc_Sb(spec, p, x, shifted),
            calc_dSbdx=lambda p, x, shifted=False: Sm.calc_dSbdx(spec, p, x, shifted),
            tie=lambda v: Sm.tie_fields(spec, v),
        )
    raise TypeError(f"unknown model spec {type(spec)}")
