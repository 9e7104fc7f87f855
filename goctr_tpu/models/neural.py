"""Config-driven feed-forward network — capability parity with the
reference's legacy neuron-graph engine (/root/reference/nn/:
Neural/Layer/Neuron/Synapse objects with per-neuron fire, network.go:8-33,
layer.go:30-44, losses loss.go:47-114, persist.go:8-67).

Per-neuron Go objects make no sense on a TPU; the same Config surface
(layout, per-layer activations, bias, loss, weight std-dev init) drives the
jitted dense engine instead. JSON dump/restore round-trips the full config +
weights like nn/persist.go.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.ops.activations import ACTIVATIONS


@dataclasses.dataclass
class NeuralConfig:
    """Mirrors reference nn.Config (network.go:14-33)."""
    inputs: int
    layout: tuple[int, ...]                     # neurons per layer
    activation: str | tuple[str, ...] = "sigmoid"
    mode: str = "binary"                        # binary|multiclass|regression
    bias: bool = True
    weight_std: float = 0.5                     # NewNormal init (weights.go)
    loss: str = "cross_entropy"                 # cross_entropy|mse

    def activations(self) -> tuple[str, ...]:
        if isinstance(self.activation, str):
            return (self.activation,) * len(self.layout)
        return tuple(self.activation)


class Neural:

    def __init__(self, config: NeuralConfig, seed: int = 0):
        self.config = config
        key = jax.random.key(seed)
        dims = (config.inputs,) + tuple(config.layout)
        self.weights: list[np.ndarray] = []
        self.biases: list[np.ndarray] = []
        for i in range(len(dims) - 1):
            key, k = jax.random.split(key)
            self.weights.append(np.asarray(
                jax.random.normal(k, (dims[i], dims[i + 1]))
                * config.weight_std, np.float32))
            self.biases.append(np.zeros(dims[i + 1], np.float32))

    # ------------------------------------------------------------ forward --
    def forward(self, x: np.ndarray) -> np.ndarray:
        acts = self.config.activations()
        h = jnp.asarray(np.atleast_2d(np.asarray(x, np.float32)))
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            h = h @ jnp.asarray(w)
            if self.config.bias:
                h = h + jnp.asarray(b)
            h = ACTIVATIONS[acts[i]](h)
        return np.asarray(h)

    predict = forward

    # -------------------------------------------------------------- train --
    def train(self, X, Y, *, lr: float = 0.1, epochs: int = 100,
              batch_size: int = 32, seed: int = 0) -> list[float]:
        X = np.asarray(X, np.float32)
        Y = np.atleast_2d(np.asarray(Y, np.float32))
        if Y.shape[0] != X.shape[0]:
            Y = Y.T
        acts = self.config.activations()
        use_bias = self.config.bias
        loss_name = self.config.loss

        def fwd(params, x):
            h = x
            for i in range(len(params["w"])):
                h = h @ params["w"][i]
                if use_bias:
                    h = h + params["b"][i]
                h = ACTIVATIONS[acts[i]](h)
            return h

        def loss_fn(params, x, y):
            out = fwd(params, x)
            if loss_name == "mse":
                return jnp.mean((out - y) ** 2)
            eps = 1e-7
            out = jnp.clip(out, eps, 1 - eps)
            return -jnp.mean(y * jnp.log(out) + (1 - y) * jnp.log(1 - out))

        @jax.jit
        def step(params, x, y):
            l, g = jax.value_and_grad(loss_fn)(params, x, y)
            params = jax.tree.map(lambda p, gr: p - lr * gr, params, g)
            return params, l

        params = {"w": [jnp.asarray(w) for w in self.weights],
                  "b": [jnp.asarray(b) for b in self.biases]}
        rng = np.random.default_rng(seed)
        curve = []
        n = X.shape[0]
        for _ in range(epochs):
            perm = rng.permutation(n)
            tot = 0.0
            for s in range(0, n, batch_size):
                idx = perm[s:s + batch_size]
                params, l = step(params, jnp.asarray(X[idx]),
                                 jnp.asarray(Y[idx]))
                tot += float(l) * idx.size
            curve.append(tot / n)
        self.weights = [np.asarray(w) for w in params["w"]]
        self.biases = [np.asarray(b) for b in params["b"]]
        return curve

    # ------------------------------------------------------------ persist --
    def marshal(self) -> str:
        """nn/persist.go:8-40 equivalent: full config + weights dump."""
        return json.dumps({
            "config": dataclasses.asdict(self.config),
            "weights": [w.tolist() for w in self.weights],
            "biases": [b.tolist() for b in self.biases],
        })

    @classmethod
    def unmarshal(cls, blob: str) -> "Neural":
        d = json.loads(blob)
        cfg = d["config"]
        cfg["layout"] = tuple(cfg["layout"])
        if isinstance(cfg["activation"], list):
            cfg["activation"] = tuple(cfg["activation"])
        net = cls(NeuralConfig(**cfg))
        net.weights = [np.asarray(w, np.float32) for w in d["weights"]]
        net.biases = [np.asarray(b, np.float32) for b in d["biases"]]
        return net
