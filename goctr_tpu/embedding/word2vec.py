"""item2vec / word2vec: batched skip-gram & CBOW on device.

Re-architecture of the reference engine
(/root/reference/feature/embedding/model/word2vec/): where the reference runs
Hogwild goroutines doing per-word axpy updates with a sigmoid lookup table
(word2vec.go:151-221, optimizer.go:52-129, sigmoid_table.go), this builds the
epoch's (center, context) examples vectorized on host, then trains in one
jitted lax.scan of minibatches with **closed-form SGNS/HS gradients applied as
scatter-adds** into donated [V, D] tables — no dense [V, D] gradient is ever
materialized, so HBM traffic per step is O(batch · dim), the TPU equivalent of
the reference's lock-free sparse writes (and deterministic, unlike Hogwild).

Supported, mirroring options.go:38-104: SkipGram | CBOW × NegativeSampling |
HierarchicalSoftmax, window shrink, frequency subsampling, min_count
filtering, linear LR decay (word2vec.go:223-243).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.embedding.dictionary import Dictionary
from goctr_tpu.embedding.huffman import build_huffman_paths

log = logging.getLogger(__name__)


@dataclasses.dataclass
class Word2VecOptions:
    """Defaults mirror reference options.go:38-59 (dim 10, window 5,
    lr 0.025, iter 15, min_count 5, negative 5, subsample 1e-3, cbow+ns);
    TrainEmbedding overrides to skipgram+hs (wordemb.go:9-32)."""
    dim: int = 10
    window: int = 5
    init_lr: float = 0.025
    min_lr: Optional[float] = None          # default init_lr * 1e-4
    iters: int = 15
    min_count: int = 5
    negative: int = 5
    subsample_threshold: float = 1e-3
    model: str = "skipgram"                 # skipgram | cbow
    optimizer: str = "ns"                   # ns | hs
    batch_size: int = 8192
    max_depth: int = 100
    to_lower: bool = False
    seed: int = 0
    verbose: bool = False
    table_size: int = 1 << 20
    # overlap host window-expansion of iter i+1 with the device scan of
    # iter i (a worker thread that also starts the h2d copy). False =
    # fully serial host→device iterations — needed on backends where
    # multi-threaded dispatch is unreliable (the axon relay).
    overlap: bool = True

    def __post_init__(self):
        if self.min_lr is None:
            self.min_lr = self.init_lr * 1e-4


class Word2Vec:

    def __init__(self, opts: Optional[Word2VecOptions] = None, **kw):
        self.opts = opts or Word2VecOptions(**kw)
        self.dictionary: Optional[Dictionary] = None
        self.w_in: Optional[np.ndarray] = None
        self.w_out: Optional[np.ndarray] = None
        self._paths = self._codes = self._lengths = None
        self.words_trained = 0

    # ----------------------------------------------------------- training --
    def train(self, docs: Iterable[Sequence[str] | str]) -> "Word2Vec":
        o = self.opts
        t0 = time.perf_counter()
        self.dictionary, encoded = Dictionary.build(docs, o.to_lower)
        v = len(self.dictionary)
        if v == 0:
            raise ValueError("empty corpus")
        counts = self.dictionary.counts_array()

        # min_count filter (corpus filter semantics; ids keep their slots so
        # the exported map covers only surviving words)
        valid = counts >= o.min_count
        if o.verbose:
            log.info("vocab %d (%d ≥ min_count) read in %.2fs", v,
                     int(valid.sum()), time.perf_counter() - t0)

        rng = np.random.default_rng(o.seed)
        self._init_state(counts, rng)
        keep = self.dictionary.keep_probs(o.subsample_threshold)
        total_words = int(sum(len(d) for d in encoded))
        flat_docs = [d[valid[d]] for d in encoded]   # drop rare words
        # corpus layout is static across iterations: flatten ONCE
        flat_all, doc_id = self._flatten_corpus(flat_docs)
        words_per_iter = int(flat_all.size)

        w_in = jnp.asarray(self.w_in)
        w_out = jnp.asarray(self.w_out)
        device_tables = self._device_tables()
        row_scales = self._static_row_scales(counts)
        step_fn = self._make_epoch_fn()

        # Host window-expansion for iteration i+1 overlaps the device scan
        # of iteration i (VERDICT r2 #6: the two stages serialized —
        # per-iteration wall was host + device, not max(host, device)).
        # One ordered worker thread keeps the rng stream sequential =
        # deterministic; device_put inside _batchify starts the h2d copy
        # early too.
        from concurrent.futures import ThreadPoolExecutor

        def produce():
            centers, ctx = self._gen_examples(flat_all, doc_id, keep, rng)
            if centers.size == 0:
                return None, 0
            return self._batchify(centers, ctx, rng), int(centers.size)

        class _Serial:
            """overlap=False: produce inline on the main thread."""

            def submit(self, fn):
                class R:
                    def __init__(self):
                        self._v = fn()

                    def result(self):
                        return self._v
                return R()

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        words_done = 0
        total_train_words = max(total_words * o.iters, 1)
        pool_cm = (ThreadPoolExecutor(max_workers=1) if o.overlap
                   else _Serial())
        with pool_cm as pool:
            fut = pool.submit(produce)
            for it in range(o.iters):
                te = time.perf_counter()
                batches, n_ex = fut.result()
                if it + 1 < o.iters:
                    fut = pool.submit(produce)
                if n_ex == 0:
                    continue
                lr_start = max(o.min_lr, o.init_lr *
                               (1 - words_done / total_train_words))
                words_done += words_per_iter
                lr_end = max(o.min_lr, o.init_lr *
                             (1 - words_done / total_train_words))
                w_in, w_out = step_fn(
                    w_in, w_out, *device_tables, *row_scales, *batches,
                    jnp.float32(lr_start), jnp.float32(lr_end),
                    jax.random.key(o.seed * 1000 + it))
                self.words_trained += n_ex
                if o.verbose:
                    jax.block_until_ready(w_in)
                    log.info("iter %d: %d examples in %.2fs (%.0f/s)", it,
                             n_ex, time.perf_counter() - te,
                             n_ex / max(time.perf_counter() - te, 1e-9))
        self.w_in = np.asarray(w_in)
        self.w_out = np.asarray(w_out)
        return self

    def train_file(self, path, *, batch_docs: int = 20_000) -> "Word2Vec":
        """Out-of-core twin of train() — the streaming fs-corpus variant
        (reference corpus/fs/fs.go batched channel reads + streaming train,
        word2vec.go:151-196). Two passes per the reference design: pass 1
        builds the dictionary line-by-line; each iteration then re-reads the
        file in `batch_docs`-line chunks, generates that chunk's examples,
        and feeds the same jitted epoch — host memory stays O(chunk), never
        O(corpus)."""
        o = self.opts
        t0 = time.perf_counter()
        d = Dictionary()
        total_words = 0
        with open(path) as f:
            for line in f:
                toks = line.split()
                if o.to_lower:
                    toks = [t.lower() for t in toks]
                if toks:
                    d.add(*toks)
                    total_words += len(toks)
        self.dictionary = d
        v = len(d)
        if v == 0:
            raise ValueError("empty corpus")
        counts = d.counts_array()
        valid = counts >= o.min_count
        if o.verbose:
            log.info("vocab %d (%d ≥ min_count) read in %.2fs", v,
                     int(valid.sum()), time.perf_counter() - t0)

        rng = np.random.default_rng(o.seed)
        self._init_state(counts, rng)
        keep = d.keep_probs(o.subsample_threshold)

        w_in = jnp.asarray(self.w_in)
        w_out = jnp.asarray(self.w_out)
        device_tables = self._device_tables()
        row_scales = self._static_row_scales(counts)
        step_fn = self._make_epoch_fn()

        words_done = 0
        total_train_words = max(total_words * o.iters, 1)
        for it in range(o.iters):
            # chunk 0 uses the same raw key as train()'s iteration key, so a
            # corpus that fits one chunk trains bit-identically to train();
            # later chunks fold in their index for distinct negatives
            iter_key = jax.random.key(o.seed * 1000 + it)
            chunk: list[np.ndarray] = []
            chunk_idx = 0

            def flush(w_in, w_out, words_done, chunk_idx):
                centers, ctx = self._gen_examples(
                    *self._flatten_corpus(chunk), keep, rng)
                lr_start = max(o.min_lr, o.init_lr *
                               (1 - words_done / total_train_words))
                words_done += sum(len(c) for c in chunk)
                lr_end = max(o.min_lr, o.init_lr *
                             (1 - words_done / total_train_words))
                if centers.size:
                    key = iter_key if chunk_idx == 0 else \
                        jax.random.fold_in(iter_key, chunk_idx)
                    w_in, w_out = step_fn(
                        w_in, w_out, *device_tables, *row_scales,
                        *self._batchify(centers, ctx, rng),
                        jnp.float32(lr_start), jnp.float32(lr_end), key)
                    self.words_trained += centers.size
                return w_in, w_out, words_done, chunk_idx + 1

            with open(path) as f:
                for line in f:
                    ids = d.encode(line, o.to_lower)
                    if ids.size:
                        chunk.append(ids[valid[ids]])
                    if len(chunk) >= batch_docs:
                        w_in, w_out, words_done, chunk_idx = flush(
                            w_in, w_out, words_done, chunk_idx)
                        chunk = []
            if chunk:
                w_in, w_out, words_done, chunk_idx = flush(
                    w_in, w_out, words_done, chunk_idx)
        self.w_in = np.asarray(w_in)
        self.w_out = np.asarray(w_out)
        return self

    def _init_state(self, counts: np.ndarray, rng: np.random.Generator):
        """w_in init + HS Huffman paths or NS output table, from a built
        dictionary (word2vec standard init; HuffnamTree huffman.go:23-57)."""
        o = self.opts
        v = len(self.dictionary)
        self.w_in = ((rng.random((v, o.dim)).astype(np.float32) - 0.5)
                     / o.dim)
        if o.optimizer == "hs":
            paths, codes, lengths = build_huffman_paths(
                counts.tolist(), o.max_depth)
            self._paths, self._codes, self._lengths = paths, codes, lengths
            self.w_out = np.zeros((max(v - 1, 1), o.dim), np.float32)
        else:
            self.w_out = np.zeros((v, o.dim), np.float32)

    # ------------------------------------------------------ example build --
    @staticmethod
    def _flatten_corpus(docs: list[np.ndarray]):
        """One-time corpus flatten: (flat [N] int32, doc_id [N] int32).
        Static across iterations — only the subsample mask is per-iter."""
        docs = [d for d in docs if d.size]
        if not docs:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        flat = np.concatenate(docs).astype(np.int32)
        doc_id = np.repeat(np.arange(len(docs), dtype=np.int32),
                           [d.size for d in docs])
        return flat, doc_id

    def _gen_examples(self, flat_all: np.ndarray, doc_id_all: np.ndarray,
                      keep: np.ndarray, rng: np.random.Generator):
        """Vectorized window expansion with per-center window shrink and
        subsampling (model.go:59-66 semantics). Returns (centers [N],
        ctx [N] for skipgram | ctx [N, 2w] −1-padded for cbow).

        Fully vectorized: one subsample mask over the flat corpus (the r2
        version looped Python-side over every doc) and, for skip-gram,
        per-offset pair lists instead of materializing + nonzero-scanning
        an [n, 2w] context matrix."""
        o = self.opts
        if flat_all.size == 0:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        m = rng.random(flat_all.size) < keep[flat_all]
        fk = flat_all[m]
        dk = doc_id_all[m]
        n = fk.size
        if n < 2:
            return np.zeros(0, np.int32), np.zeros(0, np.int32)
        radius = rng.integers(1, o.window + 1, n)

        if o.model == "cbow":
            ctx = np.full((n, 2 * o.window), -1, dtype=np.int32)
            col = 0
            for off in range(-o.window, o.window + 1):
                if off == 0:
                    continue
                src = np.arange(n) + off
                ok = (src >= 0) & (src < n) & (radius >= abs(off))
                srcc = np.clip(src, 0, n - 1)
                ok &= dk[srcc] == dk
                ctx[ok, col] = fk[srcc][ok]
                col += 1
            has_ctx = (ctx >= 0).any(axis=1)
            return fk[has_ctx], ctx[has_ctx]

        # skip-gram: emit (center, context) pairs per offset directly
        centers_parts, ctx_parts = [], []
        idx = np.arange(n)
        for off in range(-o.window, o.window + 1):
            if off == 0:
                continue
            src = idx + off
            ok = (src >= 0) & (src < n) & (radius >= abs(off))
            srcc = np.clip(src, 0, n - 1)
            ok &= dk[srcc] == dk
            centers_parts.append(fk[ok])
            ctx_parts.append(fk[srcc[ok]])
        return (np.concatenate(centers_parts),
                np.concatenate(ctx_parts))

    def _batchify(self, centers: np.ndarray, ctx: np.ndarray,
                  rng: np.random.Generator):
        o = self.opts
        n = centers.shape[0]
        perm = rng.permutation(n)
        centers, ctx = centers[perm], ctx[perm]
        bs = o.batch_size
        n_batches = -(-n // bs)
        # bucket batch count to the next power of two: epoch shapes then
        # repeat across iterations/corpora, so the jitted epoch compiles
        # once (compiles via the remote-compile relay cost minutes; padded
        # batches are masked no-ops)
        bucket = 1
        while bucket < n_batches:
            bucket *= 2
        n_batches = bucket
        pad = n_batches * bs - n
        if pad:
            centers = np.concatenate([centers, np.full(pad, -1, np.int32)])
            ctx = np.concatenate(
                [ctx, np.full((pad,) + ctx.shape[1:], -1, np.int32)])
        return (jnp.asarray(centers.reshape(n_batches, bs)),
                jnp.asarray(ctx.reshape((n_batches, bs) + ctx.shape[1:])))

    def _device_tables(self):
        o = self.opts
        if o.optimizer == "hs":
            return (jnp.asarray(self._paths), jnp.asarray(self._codes))
        return (jnp.asarray(self.dictionary.unigram_table(o.table_size)),
                jnp.zeros((0, 0), jnp.float32))   # placeholder

    def _static_row_scales(self, counts: np.ndarray, cap: float = 16.0):
        """Expectation-based per-row update caps.

        r2 capped each row's accumulated in-batch step at `cap` examples'
        worth using REALIZED per-batch counts — two extra 1M-row scatter
        passes per batch, half the epoch's device wall (BENCH_NOTES r3).
        The corpus is stationary, so the expected per-batch count is a
        static function of corpus statistics: word i appears ≈ B·p(i)
        times among a batch's input rows, a Huffman node n appears
        ≈ B·Σ_{w: n ∈ path(w)} p(w) times among output rows, an NS
        output row ≈ B·(p(i) + K·q(i)) with q the unigram^0.75 table law.
        Same stability property, zero train-time scatters.
        """
        o = self.opts
        p = counts / max(counts.sum(), 1)
        B = float(o.batch_size)
        if o.model == "cbow":
            exp_in = B * 2 * o.window * p      # one hit per context slot
        else:
            exp_in = B * p                     # ctx word's input vector
        if o.optimizer == "hs":
            node_p = np.zeros(self.w_out.shape[0], np.float64)
            valid = self._paths >= 0
            np.add.at(node_p, np.maximum(self._paths, 0).ravel(),
                      (p[:, None] * valid).ravel())
            exp_out = B * node_p
        else:
            tab = self.dictionary.unigram_table(o.table_size)
            q = np.bincount(tab, minlength=len(counts)) / max(len(tab), 1)
            exp_out = B * (p + o.negative * q)
        s_in = np.minimum(1.0, cap / np.maximum(exp_in, 1.0))
        s_out = np.minimum(1.0, cap / np.maximum(exp_out, 1.0))
        return (jnp.asarray(s_in.astype(np.float32)),
                jnp.asarray(s_out.astype(np.float32)))

    # ------------------------------------------------------- jitted epoch --
    def _make_epoch_fn(self):
        o = self.opts
        is_hs = o.optimizer == "hs"
        is_cbow = o.model == "cbow"
        neg_k = o.negative

        @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
        def epoch(w_in, w_out, tab_a, tab_b, scale_in, scale_out,
                  centers_b, ctx_b, lr_start, lr_end, key):
            n_batches = centers_b.shape[0]

            def body(carry, args):
                w_in, w_out = carry
                b, centers, ctx = args
                frac = b.astype(jnp.float32) / jnp.maximum(n_batches - 1, 1)
                lr = lr_start + (lr_end - lr_start) * frac
                cmask = (centers >= 0).astype(jnp.float32)
                c_safe = jnp.maximum(centers, 0)

                if is_cbow:
                    # input vector = mean of context vectors; "center" is target
                    ctx_safe = jnp.maximum(ctx, 0)
                    ctx_m = (ctx >= 0).astype(jnp.float32)
                    vs = jnp.take(w_in, ctx_safe, axis=0)          # [B,2w,D]
                    denom = jnp.maximum(ctx_m.sum(1, keepdims=True), 1.0)
                    v = (vs * ctx_m[..., None]).sum(1) / denom     # [B,D]
                    targets = c_safe
                    t_mask = cmask
                else:
                    v = jnp.take(w_in, jnp.maximum(ctx, 0), axis=0)  # [B,D]
                    # skip-gram convention (model.go:48-78): the *context*
                    # word's input vector is trained against the center target
                    targets = c_safe
                    t_mask = cmask * (ctx >= 0).astype(jnp.float32)

                # Batched SGD collision control: a row hit N times in one
                # batch gets N summed updates (the reference's sequential
                # Hogwild processes one at a time, word2vec.go:198-221, so
                # its lr is per-example). Sum is exactly per-example SGD
                # when collisions ≈ 1 (any realistic vocab); to stay stable
                # when vocab ≪ batch, the accumulated per-row step is
                # capped at `cap` examples' worth via the STATIC
                # expectation-based scales (_static_row_scales) — r2's
                # realized-count version cost two extra 1M-row scatter
                # passes per batch (half the epoch device wall).

                # all table writes are PLAIN masked .at[].add scatters:
                # at item2vec vocabs (10k-100k) the table is small enough
                # that XLA vectorizes the scatter — measured 93.3M rows/s
                # vs 27.7M for the sort+dedup front-end at V=10k, n=1.1M
                # (BENCH_NOTES r3; the serial-scatter wall only exists for
                # multi-GB tables). The r3 dedup'd variant additionally
                # made the 809-batch epoch dispatch long enough to crash
                # the relay worker. Duplicate ids sum natively — identical
                # math, fp order aside; -1 ids contribute nothing.
                def scatter_rows(tab, ids, rows):
                    m = (ids >= 0).astype(jnp.float32)
                    return tab.at[jnp.maximum(ids, 0)].add(
                        rows * m[:, None])

                dim = w_in.shape[1]
                if is_hs:
                    paths = jnp.take(tab_a, targets, axis=0)       # [B,P]
                    codes = jnp.take(tab_b, targets, axis=0)       # [B,P]
                    pmask = (paths >= 0).astype(jnp.float32) * t_mask[:, None]
                    p_safe = jnp.maximum(paths, 0)
                    u = jnp.take(w_out, p_safe, axis=0)            # [B,P,D]
                    z = jnp.einsum("bd,bpd->bp", v, u)
                    f = jax.nn.sigmoid(z)
                    g = (1.0 - codes - f) * pmask * lr             # [B,P]
                    dv = jnp.einsum("bp,bpd->bd", g, u)
                    gs = g * jnp.take(scale_out, p_safe)
                    w_out = scatter_rows(
                        w_out, jnp.where(pmask > 0, p_safe, -1).reshape(-1),
                        (gs[..., None] * v[:, None, :]).reshape(-1, dim))
                else:
                    kkey = jax.random.fold_in(key, b)
                    negs = jnp.take(
                        tab_a,
                        jax.random.randint(kkey, (centers.shape[0], neg_k),
                                           0, tab_a.shape[0]))     # [B,K]
                    ids = jnp.concatenate([targets[:, None], negs], 1)
                    labels = jnp.concatenate(
                        [jnp.ones_like(targets[:, None], jnp.float32),
                         jnp.zeros_like(negs, jnp.float32)], 1)
                    u = jnp.take(w_out, ids, axis=0)               # [B,K+1,D]
                    z = jnp.einsum("bd,bkd->bk", v, u)
                    g = (labels - jax.nn.sigmoid(z)) * t_mask[:, None] * lr
                    dv = jnp.einsum("bk,bkd->bd", g, u)
                    gs = g * jnp.take(scale_out, ids)
                    w_out = scatter_rows(
                        w_out, ids.reshape(-1),
                        (gs[..., None] * v[:, None, :]).reshape(-1, dim))

                if is_cbow:
                    sc = jnp.take(scale_in, ctx_safe)
                    upd = ((dv / denom)[:, None, :]
                           * (ctx_m * sc)[..., None])
                    w_in = scatter_rows(
                        w_in, jnp.where(ctx_m > 0, ctx_safe, -1).reshape(-1),
                        upd.reshape(-1, dim))
                else:
                    in_ids = jnp.maximum(ctx, 0)
                    sc = jnp.take(scale_in, in_ids)
                    w_in = scatter_rows(
                        w_in, jnp.where(t_mask > 0, in_ids, -1),
                        dv * (t_mask * sc)[:, None])
                return (w_in, w_out), None

            (w_in, w_out), _ = jax.lax.scan(
                body, (w_in, w_out),
                (jnp.arange(n_batches), centers_b, ctx_b))
            return w_in, w_out

        return epoch

    # --------------------------------------------------------------- export --
    def vectors(self, agg: bool = True) -> np.ndarray:
        """[V, D] float32. agg adds the context/output vectors for NS
        (reference vector.Agg path, word2vec.go:249-272); HS exports w_in."""
        if self.w_in is None:
            raise RuntimeError("not trained")
        if agg and self.opts.optimizer == "ns":
            return self.w_in + self.w_out
        return self.w_in


def _cli(argv: Optional[Sequence[str]] = None) -> int:
    """`python -m goctr_tpu.embedding.word2vec -i corpus.txt -o model.txt ...`

    Flag surface mirroring the reference's cobra bindings
    (/root/reference/feature/embedding/model/word2vec/options.go:106-126):
    dim/window/iter/min-count/negative/lr/model/optimizer/thread(batch)/
    subsample-threshold, plus input/output files.
    """
    import argparse

    p = argparse.ArgumentParser(
        prog="goctr_tpu.embedding.word2vec",
        description="Train item2vec/word2vec from a text corpus "
                    "(one document per line).")
    p.add_argument("-i", "--input", required=True, help="corpus file")
    p.add_argument("-o", "--output", required=True,
                   help="output text model (`word v1..vn` per line)")
    p.add_argument("-d", "--dim", type=int, default=10)
    p.add_argument("-w", "--window", type=int, default=5)
    p.add_argument("--iter", type=int, default=15)
    p.add_argument("--min-count", type=int, default=5)
    p.add_argument("--negative", type=int, default=5)
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--model", choices=("skipgram", "cbow"), default="skipgram")
    p.add_argument("--optimizer", choices=("ns", "hs"), default="ns")
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument("--subsample-threshold", type=float, default=1e-3)
    p.add_argument("--to-lower", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)

    if a.verbose:
        logging.basicConfig(level=logging.INFO)
    w2v = Word2Vec(Word2VecOptions(
        dim=a.dim, window=a.window, iters=a.iter, min_count=a.min_count,
        negative=a.negative, init_lr=a.lr, model=a.model,
        optimizer=a.optimizer, batch_size=a.batch_size,
        subsample_threshold=a.subsample_threshold, to_lower=a.to_lower,
        seed=a.seed, verbose=a.verbose))
    w2v.train_file(a.input)

    from goctr_tpu.embedding.store import (
        embedding_map_from_model, save_embedding_map,
    )
    emb = embedding_map_from_model(w2v)
    save_embedding_map(a.output, emb)
    log.info("saved %d x %d vectors to %s", len(emb), emb.dim, a.output)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(_cli(sys.argv[1:]))
