"""Learning-rate schedules matching the sklearn-port names
(nn/neural_network/basemlp64.go LearningRate: constant | invscaling |
adaptive). `adaptive` is plateau-driven and host-controlled (the fit loop
divides lr by 5 on stall), so here it resolves to constant; the division
lives in MLPClassifier.fit.
"""
from __future__ import annotations

from typing import Callable


def make_schedule(name: str, lr_init: float,
                  power_t: float = 0.5) -> Callable[[int], float]:
    name = name.lower()
    if name in ("constant", "adaptive"):
        return lambda step: lr_init
    if name == "invscaling":
        # sklearn: lr = lr_init / (t+1)^power_t, t = step count
        return lambda step: lr_init / (1.0 + step) ** power_t
    raise ValueError(f"unknown lr schedule {name!r}")
