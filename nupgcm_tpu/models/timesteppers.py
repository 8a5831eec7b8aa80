"""BDF1/BDF2 implicit-explicit timesteppers (config + coefficients).

Parity with reference src/timesteppers.jl and the theta coefficients of
src/evolution.jl:187-193:
  theta(BDF1) = dt a^2 e^2 / mu_rho
  theta(BDF2) = (2/3) dt a^2 e^2 / mu_rho
BDF2's first step runs as BDF1 (reference src/model.jl:134-137,
src/evolution.jl:110).  Adaptive CFL stepping is BDF1-only
(src/timesteppers.jl:108-122).

Unlike the reference's mutable Ref-based types, these are frozen
configs; the evolving (t, dt) live in the State pytree.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BDF1:
    t_start: float
    t_stop: float
    dt: float
    adaptive: bool = False
    CFL_factor: float = 0.8
    order: int = 1


@dataclass(frozen=True)
class BDF2:
    t_start: float
    t_stop: float
    dt: float
    order: int = 2

    @property
    def adaptive(self) -> bool:
        return False
