"""Training losses.

The reference trains probability-space BCE on sigmoid outputs with a 1e-8
fudge inside log(1-p) (model/cost.go:7-18). The TPU-native models keep
logits until the loss, so training uses the numerically stable
`bce_with_logits`; `binary_cross_entropy` exists for probability-space
parity checks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy(y_pred, y_true, eps: float = 1e-8):
    """-mean(y*log(p) + (1-y)*log(1+eps-p)); reference BinaryCrossEntropy32."""
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    pos = jnp.log(jnp.maximum(y_pred, 1e-12)) * y_true
    neg = jnp.log(jnp.maximum(1.0 + eps - y_pred, 1e-12)) * (1.0 - y_true)
    return -jnp.mean(pos + neg)


def bce_with_logits(logits, y_true):
    """Stable sigmoid cross-entropy: max(z,0) - z*y + log1p(exp(-|z|))."""
    logits = logits.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0) - logits * y_true +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def mse(y_pred, y_true):
    """Reference MSE32 cost.go:21-24."""
    d = y_pred.astype(jnp.float32) - y_true.astype(jnp.float32)
    return jnp.mean(d * d)


def rms(y_pred, y_true):
    """Reference RMS32 cost.go:27-30."""
    return jnp.sqrt(mse(y_pred, y_true))
