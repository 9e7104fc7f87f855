"""Solver registry — optax gradient transformations keyed by the reference's
solver names (nn/base/optimizers.go:26-58: sgd/adagrad/rmsprop/adadelta/adam
plus gonum lbfgs; gorgonia Adam in model/model.go:88).

The reference applies L2 by adding `l2 * w` to the raw gradient before the
solver update (gorgonia WithL2Reg; sklearn-port adds alpha*w in backprop,
basemlp64.go:392-399). `make_solver(l2=...)` reproduces exactly that ordering
(decay added *before* the adaptive scaling), which is classic L2, not AdamW.
Use `weight_decay` for decoupled AdamW-style decay after scaling.
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import optax

ScheduleOrFloat = Union[float, Callable[[int], float]]

SOLVERS = ("sgd", "adam", "adagrad", "rmsprop", "adadelta", "lbfgs")


def make_solver(
    name: str = "adam",
    lr: ScheduleOrFloat = 1e-3,
    *,
    l2: float = 0.0,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    nesterov: bool = False,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    rho: float = 0.95,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "sgd":
        core = optax.trace(decay=momentum, nesterov=nesterov) if momentum \
            else optax.identity()
    elif name == "adam":
        core = optax.scale_by_adam(b1=beta1, b2=beta2, eps=epsilon)
    elif name == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.0, eps=epsilon)
    elif name == "rmsprop":
        core = optax.scale_by_rms(decay=rho, eps=epsilon)
    elif name == "adadelta":
        core = optax.scale_by_adadelta(rho=rho, eps=epsilon)
    elif name == "lbfgs":
        # second-order path; used via optax.value_and_grad_from_state in the
        # MLPClassifier lbfgs fit (full-batch), not in the minibatch trainer
        return optax.lbfgs()
    else:
        raise ValueError(f"unknown solver {name!r}; one of {SOLVERS}")

    chain = []
    if l2:
        chain.append(optax.add_decayed_weights(l2))     # classic L2 (pre-scale)
    chain.append(core)
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))  # decoupled
    if callable(lr):
        chain.append(optax.scale_by_schedule(lambda step: -lr(step)))
    else:
        chain.append(optax.scale(-lr))
    return optax.chain(*chain)
