"""PRNG discipline: one root seed, explicit split streams.

The reference relies on Go's global math/rand plus a numpy-compatible
randomkit RNG (/root/reference/nn/base/source.go). JAX requires explicit
threading of PRNG keys; this helper names the streams so training code never
reuses a key.
"""
from __future__ import annotations

import jax


class PRNGPool:
    """Derives named, counted subkeys from a root seed.

    >>> pool = PRNGPool(42)
    >>> k1 = pool.next("dropout")   # distinct every call
    >>> k2 = pool.named("init")     # stable for a given name
    """

    def __init__(self, seed: int = 0):
        self._root = jax.random.key(seed)
        self._counters: dict[str, int] = {}

    def named(self, name: str) -> jax.Array:
        return jax.random.fold_in(self._root, _stable_hash(name))

    def next(self, name: str) -> jax.Array:
        c = self._counters.get(name, 0)
        self._counters[name] = c + 1
        return jax.random.fold_in(self.named(name), c)


def _stable_hash(s: str) -> int:
    # FNV-1a 32-bit over the UTF-8 bytes; stable across processes (unlike hash()).
    h = 0x811C9DC5
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h
