"""Per-sample L1/L2 normalizers; parity with
/root/reference/feature/samplenormalizers.go (zero vectors stay zero).

Functional forms work on NumPy or JAX arrays (rows normalized independently)
so the same code runs in host assembly and inside jitted models.
"""
from __future__ import annotations

import numpy as np


def normalize_l1(x, axis: int = -1):
    xp = np if isinstance(x, np.ndarray) else _jnp()
    x = xp.asarray(x)
    s = xp.sum(xp.abs(x), axis=axis, keepdims=True)
    return xp.where(s == 0, xp.zeros_like(x), x / xp.where(s == 0, 1, s))


def normalize_l2(x, axis: int = -1):
    xp = np if isinstance(x, np.ndarray) else _jnp()
    x = xp.asarray(x)
    s = xp.sqrt(xp.sum(x * x, axis=axis, keepdims=True))
    return xp.where(s == 0, xp.zeros_like(x), x / xp.where(s == 0, 1, s))


def _jnp():
    import jax.numpy as jnp
    return jnp


class SampleNormalizerL1:
    def fit(self, values):
        return self

    def transform(self, vs) -> np.ndarray:
        return normalize_l1(np.asarray(vs, dtype=np.float64))


class SampleNormalizerL2:
    def fit(self, values):
        return self

    def transform(self, vs) -> np.ndarray:
        return normalize_l2(np.asarray(vs, dtype=np.float64))
