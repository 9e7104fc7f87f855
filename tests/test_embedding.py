"""item2vec engine tests: dictionary/huffman invariants, embedding quality on
a planted-cluster corpus (the TPU analogue of wordemb_test.go's
nearest-neighbor eyeball, made assertable), io round-trips."""
import io

import numpy as np
import pytest

from goctr_tpu.embedding import (
    Dictionary, Searcher, Word2Vec, Word2VecOptions, load_embedding_map,
    save_embedding_map, train_embedding,
)
from goctr_tpu.embedding.huffman import build_huffman_paths
from goctr_tpu.embedding.store import embedding_map_from_model


def test_dictionary_build():
    d, enc = Dictionary.build([["a", "b", "a"], "b c"])
    assert d.word2id == {"a": 0, "b": 1, "c": 2}
    assert d.counts == [2, 2, 1]
    np.testing.assert_array_equal(enc[0], [0, 1, 0])
    np.testing.assert_array_equal(enc[1], [1, 2])


def test_unigram_table_distribution():
    d = Dictionary()
    d.add(*(["a"] * 90 + ["b"] * 10))
    t = d.unigram_table(size=10000)
    frac_a = np.mean(t == 0)
    # 90^0.75 : 10^0.75 → ~0.836
    assert frac_a == pytest.approx(0.836, abs=0.02)


def test_huffman_invariants():
    counts = [50, 30, 10, 5, 5]
    paths, codes, lengths = build_huffman_paths(counts)
    # prefix property: frequent words get shorter codes
    assert lengths[0] <= lengths[2] <= lengths[3]
    # expected code length = optimal Huffman cost
    total = sum(counts)
    avg = sum(c * l for c, l in zip(counts, lengths)) / total
    assert avg <= 2.3  # optimal for this distribution is ~2.05-2.3
    # all path node ids < V-1
    assert paths.max() < len(counts) - 1
    # codes are 0/1 within lengths
    for i, L in enumerate(lengths):
        assert set(np.unique(codes[i, :L])) <= {0.0, 1.0}
        assert np.all(paths[i, :L] >= 0)


def _cluster_corpus(n_docs=3000, seed=0):
    """Two disjoint vocab clusters; words co-occur only within a cluster."""
    rng = np.random.default_rng(seed)
    a = [f"a{i}" for i in range(10)]
    b = [f"b{i}" for i in range(10)]
    docs = []
    for _ in range(n_docs):
        pool = a if rng.random() < 0.5 else b
        docs.append(list(rng.choice(pool, size=8)))
    return docs


def _intra_inter(emb):
    words, mat = emb.as_arrays()
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    is_a = np.array([w.startswith("a") for w in words])
    intra = (sims[np.ix_(is_a, is_a)].mean() +
             sims[np.ix_(~is_a, ~is_a)].mean()) / 2
    inter = sims[np.ix_(is_a, ~is_a)].mean()
    return intra, inter


@pytest.mark.parametrize("model,opt", [
    ("skipgram", "ns"), ("skipgram", "hs"), ("cbow", "ns"), ("cbow", "hs"),
])
def test_word2vec_learns_clusters(model, opt):
    docs = _cluster_corpus()
    w2v = Word2Vec(Word2VecOptions(
        dim=16, window=3, iters=3, min_count=1, model=model, optimizer=opt,
        batch_size=512, seed=1, subsample_threshold=0)).train(docs)
    emb = embedding_map_from_model(w2v)
    assert len(emb) == 20 and emb.dim == 16
    intra, inter = _intra_inter(emb)
    assert intra > inter + 0.2, f"{model}/{opt}: intra {intra} inter {inter}"


def test_topk_neighbors_recover_planted_clusters():
    """The reference's neighbor-quality protocol as a hard gate
    (/root/reference/README.md:142-157 eyeballs `similar movies`; here the
    top-5 cosine neighbors of every word must all come from its planted
    co-occurrence cluster)."""
    from goctr_tpu.embedding.search import Searcher

    docs = _cluster_corpus(3000)
    w2v = Word2Vec(Word2VecOptions(
        dim=16, window=3, iters=3, min_count=1, model="skipgram",
        optimizer="ns", batch_size=512, seed=1,
        subsample_threshold=0)).train(docs)
    emb = embedding_map_from_model(w2v)
    s = Searcher(dict(zip(*emb.as_arrays())))
    hits = total = 0
    for w in emb.as_arrays()[0]:
        for neighbor, _score in s.search(w, k=5):
            total += 1
            hits += neighbor[0] == w[0]     # same cluster prefix a/b
    assert total == 20 * 5
    assert hits / total >= 0.95, f"cluster purity {hits}/{total}"


def test_train_file_single_chunk_matches_in_memory(tmp_path):
    """Streaming fs-corpus train (word2vec.go:151-196, corpus/fs) with one
    chunk is bit-identical to the in-memory path: same dictionary order,
    same RNG consumption, same jitted epoch."""
    docs = _cluster_corpus(300)
    p = tmp_path / "corpus.txt"
    p.write_text("\n".join(" ".join(d) for d in docs) + "\n")
    opts = dict(dim=8, window=3, iters=2, min_count=1, batch_size=512,
                seed=1, subsample_threshold=0)
    mem = Word2Vec(Word2VecOptions(**opts)).train(docs)
    stream = Word2Vec(Word2VecOptions(**opts)).train_file(
        p, batch_docs=10_000)
    assert stream.dictionary.id2word == mem.dictionary.id2word
    np.testing.assert_array_equal(stream.w_in, mem.w_in)
    np.testing.assert_array_equal(stream.w_out, mem.w_out)


def test_train_file_multi_chunk_learns(tmp_path):
    docs = _cluster_corpus(1200)
    p = tmp_path / "corpus.txt"
    p.write_text("\n".join(" ".join(d) for d in docs) + "\n")
    w2v = Word2Vec(Word2VecOptions(
        dim=16, window=3, iters=3, min_count=1, batch_size=512, seed=1,
        subsample_threshold=0)).train_file(p, batch_docs=200)
    emb = embedding_map_from_model(w2v)
    assert len(emb) == 20
    intra, inter = _intra_inter(emb)
    assert intra > inter + 0.2, f"intra {intra} inter {inter}"


def test_train_embedding_high_level():
    emb = train_embedding(_cluster_corpus(1000), window=3, dim=16, iters=2,
                          min_count=1)
    assert len(emb) == 20
    intra, inter = _intra_inter(emb)
    assert intra > inter


def test_min_count_filters_words():
    docs = [["x", "y"] * 10, ["rare", "x"]]
    emb = train_embedding(docs, window=2, dim=4, iters=1, min_count=2)
    assert "x" in emb and "y" in emb and "rare" not in emb
    # unknown word → zero vector of right dim
    assert emb.get_vec("nope").shape == (4,)
    assert np.all(emb.get_vec("nope") == 0)


def test_searcher():
    emb = {"a": np.array([1.0, 0.0]), "b": np.array([0.9, 0.1]),
           "c": np.array([0.0, 1.0])}
    s = Searcher(emb)
    res = s.search("a", k=2)
    assert res[0][0] == "b"
    assert res[0][1] > res[1][1]
    assert s.search("missing") == []


def test_save_load_roundtrip(tmp_path):
    emb = {"w1": np.array([0.5, -1.25], np.float32),
           "w2": np.array([3.0, 4.0], np.float32)}
    p = tmp_path / "model.txt"
    save_embedding_map(p, emb)
    loaded = load_embedding_map(p)
    assert set(loaded) == {"w1", "w2"}
    np.testing.assert_allclose(loaded["w1"], emb["w1"], rtol=1e-6)
    # also via text buffer
    buf = io.StringIO()
    save_embedding_map(buf, emb)
    buf.seek(0)
    assert "w1 " in buf.getvalue()
    loaded2 = load_embedding_map(buf)
    np.testing.assert_allclose(loaded2["w2"], emb["w2"], rtol=1e-6)


def test_word2vec_cli_roundtrip(tmp_path):
    """`python -m goctr_tpu.embedding.word2vec` flag surface (reference
    cobra bindings, options.go:106-126): train from a corpus file, write
    the text model, reload it."""
    from goctr_tpu.embedding.store import load_embedding_map
    from goctr_tpu.embedding.word2vec import _cli

    docs = _cluster_corpus(300)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(" ".join(d) for d in docs) + "\n")
    out = tmp_path / "model.txt"
    rc = _cli(["-i", str(corpus), "-o", str(out), "--dim", "8",
               "--iter", "2", "--min-count", "1", "--window", "3",
               "--subsample-threshold", "0"])
    assert rc == 0
    emb = load_embedding_map(out)
    assert len(emb) == 20 and emb.dim == 8


def test_ml10m_shape_neighbor_quality_gate():
    """VERDICT r4 next-#6: a quality gate at ML-10M STATISTICS (zipf
    cluster popularity, poisson doc lengths, 85/15 in/out-of-cluster mix)
    rather than the toy two-cluster corpus — scaled down in word count to
    stay CI-sized, same generator the at-scale TPU bench uses
    (scripts/bench_item2vec.py --quality). Top-5 cosine neighbors must
    mostly share the planted cluster, judged by a NumPy oracle."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from bench_item2vec import make_cluster_corpus, neighbor_purity

    from goctr_tpu.embedding.word2vec import Word2Vec

    raw, cluster_of = make_cluster_corpus(
        n_words=400_000, vocab=1000, n_clusters=50, n_docs=5000, seed=1)
    docs = [[str(w) for w in d] for d in raw]
    w2v = Word2Vec(dim=16, window=5, iters=2, min_count=1,
                   model="skipgram", optimizer="hs", batch_size=16384,
                   seed=1).train(docs)
    pur = neighbor_purity(w2v, cluster_of, n_query=300)
    assert pur >= 0.8, f"neighbor cluster purity {pur:.3f}"
