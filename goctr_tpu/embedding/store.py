"""Embedding artifacts: the word→vector map, text model file io, and the
high-level train_embedding entry.

Text format parity with the reference (vector.Save → `word v1 v2 ... vn` per
line; emb/embedding.go:28-45 Load): models round-trip with go-ctr files.
train_embedding mirrors embedding.TrainEmbedding defaults (wordemb.go:9-32:
SkipGram + hierarchical softmax, caller's window/dim/iters).
"""
from __future__ import annotations

import io
from pathlib import Path
from typing import Iterable, Mapping, Optional, Sequence

import numpy as np

from goctr_tpu.embedding.word2vec import Word2Vec, Word2VecOptions


class EmbeddingMap(dict):
    """word → np.ndarray[D]; the artifact consumed by the recommender
    (reference EmbeddingMap32, rcmd.go:501-531)."""

    @property
    def dim(self) -> int:
        for v in self.values():
            return int(np.asarray(v).shape[0])
        return 0

    def get_vec(self, word: str, dim: Optional[int] = None) -> np.ndarray:
        v = self.get(word)
        if v is not None:
            return np.asarray(v, dtype=np.float32)
        return np.zeros(dim or self.dim, dtype=np.float32)

    def as_arrays(self) -> tuple[list[str], np.ndarray]:
        words = list(self.keys())
        mat = np.stack([np.asarray(self[w], dtype=np.float32)
                        for w in words]) if words else np.zeros((0, 0))
        return words, mat


def embedding_map_from_model(model: Word2Vec, agg: bool = True,
                             min_count_only: bool = True) -> EmbeddingMap:
    """GenEmbeddingMap32 parity (word2vec.go:298-324)."""
    vecs = model.vectors(agg)
    d = model.dictionary
    counts = d.counts_array()
    out = EmbeddingMap()
    for i, w in enumerate(d.id2word):
        if min_count_only and counts[i] < model.opts.min_count:
            continue
        out[w] = vecs[i]
    return out


def train_embedding(item_seqs: Iterable[Sequence[str] | str],
                    window: int = 5, dim: int = 16, iters: int = 1,
                    **kw) -> EmbeddingMap:
    """High-level entry mirroring embedding.TrainEmbedding wordemb.go:9-32
    (SkipGram + HS); returns the word→vec map directly."""
    opts = Word2VecOptions(dim=dim, window=window, iters=iters,
                           model="skipgram", optimizer="hs", **kw)
    model = Word2Vec(opts).train(item_seqs)
    return embedding_map_from_model(model)


# ------------------------------------------------------------------ file io --

def save_embedding_map(f: io.TextIOBase | str | Path,
                       emb: Mapping[str, np.ndarray]) -> None:
    """`word v1 v2 ... vn` per line (reference vector.Save format)."""
    close = False
    if isinstance(f, (str, Path)):
        f = open(f, "w")
        close = True
    try:
        for w, v in emb.items():
            vec = " ".join(repr(float(x)) for x in np.asarray(v).ravel())
            f.write(f"{w} {vec}\n")
    finally:
        if close:
            f.close()


def load_embedding_map(f: io.TextIOBase | str | Path) -> EmbeddingMap:
    """Parse the text model format (emb.Load parity, emb/embedding.go)."""
    close = False
    if isinstance(f, (str, Path)):
        f = open(f)
        close = True
    out = EmbeddingMap()
    try:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            out[parts[0]] = np.asarray([float(x) for x in parts[1:] if x],
                                       dtype=np.float32)
    finally:
        if close:
            f.close()
    return out
