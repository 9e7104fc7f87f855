"""item2vec throughput bench on the ML-10M-shaped corpus (BENCH_NOTES).

Corpus: ~9.5M words as 100k user-history "docs" drawn from a 10k-item zipf
vocabulary — the shape of the reference's README.md:133-141 M1 Max run
(9.5M words / 17.16s ≈ 555k words/s, SkipGram+HS dim 16 window 5).

    python scripts/bench_item2vec.py [--batch=65536] [--iters=3] [--model=skipgram]

Reports aggregate pair-updates/s and words/s across all iterations after
the first (compile) — host window-expansion of iter i+1 overlaps device
execution of iter i because epoch dispatches are async (no per-iter sync).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _arg(name: str, default: str) -> str:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


def make_corpus(n_words: int = 9_500_000, vocab: int = 10_000,
                n_docs: int = 100_000, seed: int = 0) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, vocab + 1) ** 1.05
    p /= p.sum()
    words = rng.choice(vocab, size=n_words, p=p).astype(np.int64)
    cuts = np.sort(rng.choice(n_words, n_docs - 1, replace=False))
    return [w for w in np.split(words, cuts) if len(w)]


def make_cluster_corpus(n_words: int = 9_500_000, vocab: int = 10_000,
                        n_clusters: int = 500, n_docs: int = 100_000,
                        p_in: float = 0.85, seed: int = 0):
    """ML-10M-shaped corpus with PLANTED co-occurrence clusters (the
    at-scale analogue of wordemb_test.go's eyeballed neighbors / the CI
    toy gate): items partition into clusters of vocab/n_clusters; each doc
    owns a (zipf-popular) home cluster and draws p_in of its words from it,
    the rest globally. Returns (docs, cluster_of [vocab])."""
    rng = np.random.default_rng(seed)
    per = vocab // n_clusters
    cluster_of = np.arange(vocab) // per
    cluster_of = np.minimum(cluster_of, n_clusters - 1)
    p = 1.0 / np.arange(1, n_clusters + 1) ** 1.05
    p /= p.sum()
    doc_len = np.maximum(rng.poisson(n_words / n_docs, n_docs), 4)
    docs = []
    home = rng.choice(n_clusters, n_docs, p=p)
    for d in range(n_docs):
        L = doc_len[d]
        inside = rng.random(L) < p_in
        w = np.where(inside,
                     home[d] * per + rng.integers(0, per, L),
                     rng.integers(0, vocab, L))
        docs.append(w.astype(np.int64))
    return docs, cluster_of


def neighbor_purity(w2v, cluster_of: np.ndarray, k: int = 5,
                    n_query: int = 500, seed: int = 0) -> float:
    """Fraction of top-k cosine neighbors sharing the query's planted
    cluster (numpy oracle — no framework search code in the gate)."""
    vecs = w2v.vectors()
    d = w2v.dictionary
    ids = np.asarray([int(d.word(i)) for i in range(len(d))])
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-12)
    rng = np.random.default_rng(seed)
    q = rng.choice(len(ids), min(n_query, len(ids)), replace=False)
    sims = vn[q] @ vn.T
    sims[np.arange(len(q)), q] = -np.inf
    top = np.argpartition(sims, -k, axis=1)[:, -k:]
    same = cluster_of[ids[top]] == cluster_of[ids[q]][:, None]
    return float(same.mean())


def main() -> None:
    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print("backend:", jax.default_backend(), flush=True)

    from goctr_tpu.embedding.word2vec import Word2Vec

    batch = int(_arg("batch", "65536"))
    iters = int(_arg("iters", "3"))
    model = _arg("model", "skipgram")
    opt = _arg("optimizer", "hs")

    quality = "--quality" in sys.argv
    t0 = time.perf_counter()
    if quality:
        raw, cluster_of = make_cluster_corpus()
    else:
        raw = make_corpus()
    docs = [[str(w) for w in d] for d in raw]
    n_words = sum(len(d) for d in docs)
    print(f"corpus: {n_words} words, {len(docs)} docs "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    kw = dict(dim=16, window=5, model=model, optimizer=opt,
              batch_size=batch, min_count=1, verbose=False, seed=1,
              overlap=_arg("overlap", "1") == "1")
    t0 = time.perf_counter()
    Word2Vec(iters=1, **kw).train(docs)      # compile warm-up (persistent cache)
    print(f"warm-up iter (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    if "--stagebreak" in sys.argv:
        # ablation stage table (BENCH_NOTES r5): where the device epoch
        # goes — front-end (subsample/compaction/scan skeleton), + gathers
        # and einsums (noscatter), + table scatters (full)
        for ab, label in (("frontonly", "front-end + scan skeleton"),
                          ("noscatter", "+ gathers + einsums"),
                          ("", "+ table scatters (FULL)")):
            w = Word2Vec(iters=1, ablate=ab, **kw)
            w.train(docs)                    # compile this variant
            t0 = time.perf_counter()
            w2 = Word2Vec(iters=iters, ablate=ab, **kw)
            w2.train(docs)
            dt = time.perf_counter() - t0
            print(f"  {label:32s} {dt / iters:7.2f}s/iter", flush=True)
        return

    w2v = Word2Vec(iters=iters, **kw)
    t0 = time.perf_counter()
    w2v.train(docs)
    total = time.perf_counter() - t0
    pairs = w2v.words_trained          # center-context pair updates issued
    print(f"steady: {pairs} pair-updates / {total:.1f}s = "
          f"{pairs / total / 1e6:.2f}M pairs/s  "
          f"({n_words * iters / total / 1e3:.0f}k words/s) "
          f"batch={batch} iters={iters} {model}+{opt}")
    if quality:
        pur = neighbor_purity(w2v, cluster_of)
        print(f"at-scale top-5 neighbor cluster purity: {pur:.3f} "
              f"(planted 500 clusters / 10k vocab)")


if __name__ == "__main__":
    main()
