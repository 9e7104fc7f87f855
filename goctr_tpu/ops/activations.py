"""Activations and similarity ops (jnp; VPU-friendly, fused by XLA).

Parity targets: reference model/activation.go (PRelu32:10-16,
EucDistance:18-50, CosineSimilarity:52-85) and the sklearn-port activation
table (nn/neural_network/basemlp64.go:79-117).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def identity(x):
    return x


def logistic(x):
    return jax.nn.sigmoid(x)


def relu(x):
    return jax.nn.relu(x)


def tanh(x):
    return jnp.tanh(x)


def softmax(x):
    return jax.nn.softmax(x, axis=-1)


# name → fn, matching sklearn/reference activation strings
ACTIVATIONS = {
    "identity": identity,
    "logistic": logistic,
    "sigmoid": logistic,
    "relu": relu,
    "tanh": tanh,
    "softmax": softmax,
}


def prelu(x, slope):
    """Learnable leaky-relu (reference PRelu32 activation.go:10-16):
    0.5*((x - |x|)*slope + (x + |x|))."""
    return 0.5 * ((x - jnp.abs(x)) * slope + (x + jnp.abs(x)))


def cosine_similarity(x, y, eps: float = 1e-8):
    """Cosine similarity over the last axis with broadcasting
    (reference CosineSimilarity activation.go:52-85).

    x: [..., T, D], y: [..., 1, D] (or equal shapes) → [..., T].

    Norms are clamped below at eps² BEFORE the sqrt: d/dx sqrt(Σx²) is
    0/0 = NaN at an exactly-zero row, and zero rows are routine (padding
    positions from sharded_lookup return zero vectors) — a masked-out NaN
    still poisons gradients because 0·NaN = NaN. The clamp selects a
    constant branch at zero, so zero rows get exact zero gradients through
    the norm; values for any non-degenerate row are unchanged.
    """
    dot = jnp.sum(x * y, axis=-1)
    e2 = jnp.asarray(eps, dot.dtype) ** 2
    xn = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1), e2))
    yn = jnp.sqrt(jnp.maximum(jnp.sum(y * y, axis=-1), e2))
    return dot / (xn * yn + eps)


def euclidean_distance(x, y):
    """L2 distance over the last axis with broadcasting
    (reference EucDistance activation.go:18-50)."""
    d = x - y
    return jnp.sqrt(jnp.sum(d * d, axis=-1))
