"""Nearest-neighbor search over an embedding map.

The reference does a per-query Go loop over every vector
(search/search.go:92-134 brute-force cosine). TPU-native: normalize once,
one [Q, V] matmul on the MXU + top_k — batched queries for free.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Searcher:

    def __init__(self, emb: Mapping[str, np.ndarray]):
        self.words = list(emb.keys())
        if not self.words:
            raise ValueError("empty embedding map")
        mat = np.stack([np.asarray(emb[w], dtype=np.float32)
                        for w in self.words])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self._normed = jnp.asarray(mat / np.maximum(norms, 1e-12))
        self._index = {w: i for i, w in enumerate(self.words)}

        from functools import partial

        @partial(jax.jit, static_argnums=(2,))
        def _topk(normed, q, k):
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            sims = qn @ normed.T                        # [Q, V] on the MXU
            return jax.lax.top_k(sims, k)
        self._topk = _topk

    def search_vec(self, query: np.ndarray, k: int = 10
                   ) -> list[list[tuple[str, float]]]:
        q = jnp.atleast_2d(jnp.asarray(query, jnp.float32))
        sims, idx = self._topk(self._normed, q, min(k, len(self.words)))
        sims, idx = np.asarray(sims), np.asarray(idx)
        return [[(self.words[j], float(s)) for j, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idx, sims)]

    def search(self, word: str, k: int = 10) -> list[tuple[str, float]]:
        """Top-k neighbors of a word (itself excluded), reference
        Searcher.Search semantics."""
        i = self._index.get(word)
        if i is None:
            return []
        res = self.search_vec(np.asarray(self._normed[i]), k + 1)[0]
        return [(w, s) for w, s in res if w != word][:k]
