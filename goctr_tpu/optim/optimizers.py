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

import jax
import jax.numpy as jnp
import optax

ScheduleOrFloat = Union[float, Callable[[int], float]]

SOLVERS = ("sgd", "adam", "adagrad", "rmsprop", "adadelta", "lbfgs")

# Full-batch second-order / line-search methods, mirroring the reference's
# gonum optimize.Method registry (nn/base/optimizers.go:47-58: lbfgs/bfgs/cg).
FULLBATCH_SOLVERS = ("lbfgs", "bfgs", "cg")


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


def fullbatch_minimize(name: str, loss_fn: Callable, params,
                       max_iter: int = 200, tol: float = 1e-4):
    """Full-batch minimization of `loss_fn(params)` by one of
    FULLBATCH_SOLVERS, the TPU equivalent of driving gonum's
    lbfgs/bfgs/cg optimize.Methods over the whole training loss
    (reference nn/base/optimizers.go:34-58, basemlp64.go:675-727).

    Returns (params, loss_curve: list[float], n_iter). Stops early when the
    loss improves by less than `tol` between iterations (the reference's
    gonum convergence settings expose the same knob).
    """
    name = name.lower()
    if name == "lbfgs":
        return _minimize_lbfgs(loss_fn, params, max_iter, tol)
    if name == "bfgs":
        return _minimize_flat(loss_fn, params, max_iter, tol, _bfgs_iter)
    if name == "cg":
        return _minimize_flat(loss_fn, params, max_iter, tol, _cg_iter)
    raise ValueError(f"unknown full-batch solver {name!r}; "
                     f"one of {FULLBATCH_SOLVERS}")


def _minimize_lbfgs(loss_fn, params, max_iter, tol):
    solver = optax.lbfgs()
    opt_state = solver.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    @jax.jit
    def step(params, opt_state):
        loss, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=loss, grad=grad, value_fn=loss_fn)
        return optax.apply_updates(params, updates), opt_state, loss

    curve, prev = [], float("inf")
    for it in range(max_iter):
        params, opt_state, loss = step(params, opt_state)
        loss = float(loss)
        curve.append(loss)
        if abs(prev - loss) < tol:
            break
        prev = loss
    return params, curve, len(curve)


def _armijo_step(flat_loss, x, f, g, d, t0):
    """Backtracking Armijo line search along direction d (c1=1e-4)."""
    slope = jnp.vdot(g, d)

    def cond(carry):
        t, i = carry
        return (flat_loss(x + t * d) > f + 1e-4 * t * slope) & (i < 30)

    def body(carry):
        t, i = carry
        return t * 0.5, i + 1

    t, _ = jax.lax.while_loop(cond, body, (t0, jnp.int32(0)))
    return t


def _bfgs_iter(flat_loss, make_state):
    """One dense-BFGS iteration (inverse-Hessian update + Armijo search),
    the jittable analogue of gonum's optimize.BFGS."""
    def init(x):
        n = x.shape[0]
        f, g = jax.value_and_grad(flat_loss)(x)
        return dict(x=x, f=f, g=g, h=jnp.eye(n, dtype=x.dtype))

    @jax.jit
    def step(s):
        x, f, g, h = s["x"], s["f"], s["g"], s["h"]
        d = -(h @ g)
        # safeguard: fall back to steepest descent on non-descent direction
        d = jnp.where(jnp.vdot(d, g) < 0, d, -g)
        t = _armijo_step(flat_loss, x, f, g, d, jnp.asarray(1.0, x.dtype))
        x_new = x + t * d
        f_new, g_new = jax.value_and_grad(flat_loss)(x_new)
        sk, yk = x_new - x, g_new - g
        sy = jnp.vdot(sk, yk)
        rho = jnp.where(sy > 1e-10, 1.0 / jnp.where(sy > 1e-10, sy, 1.0), 0.0)
        ident = jnp.eye(x.shape[0], dtype=x.dtype)
        v = ident - rho * jnp.outer(sk, yk)
        h_new = v @ h @ v.T + rho * jnp.outer(sk, sk)
        h_new = jnp.where(rho > 0, h_new, h)   # skip update on tiny curvature
        return dict(x=x_new, f=f_new, g=g_new, h=h_new)

    return init(make_state), step


def _cg_iter(flat_loss, make_state):
    """One Polak–Ribière+ nonlinear-CG iteration with Armijo search and
    automatic restart, the jittable analogue of gonum's optimize.CG."""
    def init(x):
        f, g = jax.value_and_grad(flat_loss)(x)
        return dict(x=x, f=f, g=g, d=-g)

    @jax.jit
    def step(s):
        x, f, g, d = s["x"], s["f"], s["g"], s["d"]
        t = _armijo_step(flat_loss, x, f, g, d,
                         jnp.asarray(1.0, x.dtype))
        x_new = x + t * d
        f_new, g_new = jax.value_and_grad(flat_loss)(x_new)
        beta = jnp.maximum(
            0.0, jnp.vdot(g_new, g_new - g) / jnp.maximum(jnp.vdot(g, g),
                                                          1e-30))
        d_new = -g_new + beta * d
        # restart with steepest descent if not a descent direction
        d_new = jnp.where(jnp.vdot(d_new, g_new) < 0, d_new, -g_new)
        return dict(x=x_new, f=f_new, g=g_new, d=d_new)

    return init(make_state), step


def _minimize_flat(loss_fn, params, max_iter, tol, make_iter):
    from jax.flatten_util import ravel_pytree
    x0, unravel = ravel_pytree(params)
    flat_loss = lambda x: loss_fn(unravel(x))
    state, step = make_iter(flat_loss, x0)
    curve, prev = [], float("inf")
    for _ in range(max_iter):
        state = step(state)
        loss = float(state["f"])
        curve.append(loss)
        if abs(prev - loss) < tol:
            break
        prev = loss
    return unravel(state["x"]), curve, len(curve)
