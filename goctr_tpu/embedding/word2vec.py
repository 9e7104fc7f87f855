"""item2vec / word2vec: device-generated corpus-block training.

Re-architecture of the reference engine
(/root/reference/feature/embedding/model/word2vec/): where the reference runs
Hogwild goroutines doing per-word axpy updates with a sigmoid lookup table
(word2vec.go:151-221, optimizer.go:52-129, sigmoid_table.go), here the FLAT
CORPUS ships to the device once and each iteration is ONE jitted dispatch
that does everything on device: the subsample mask, the kept-word compaction
(one argsort), per-center window-shrink radii, context-window expansion, and
the SGNS/HS updates — no per-iteration host example generation and no
per-iteration h2d (the r3 design re-sent a 292 MB pair stream every
iteration, which the axon relay serializes with device compute —
BENCH_NOTES r3; words/s was host-bound at 255k against the reference's
555k/s CPU figure).

The update uses a CORPUS-BLOCK layout instead of a flat (center, context)
pair list: a block of Bp consecutive kept centers is expanded to its
[Bp, 2w] context matrix, logits come from one MXU einsum
z[b,w,·] = v[b,w,:] · u[b,·,:], and each center's Huffman-path nodes (HS) /
sampled negatives (NS) receive ONE summed row update across the center's
2w contexts — ~2w× fewer scatter rows than per-pair updates on the output
table, which is where the epoch's device wall was (small-table scatters run
~93M rows/s, BENCH_NOTES r3). Gradients are applied as plain masked
scatter-adds into donated [V, D] tables — no dense [V, D] gradient is ever
materialized, and batched duplicate-row collisions are bounded by the
static expectation scales (_static_row_scales), the deterministic
equivalent of the reference's lock-free Hogwild races.

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
    # r3 knob for overlapping host example generation with device compute.
    # Obsolete since the r4 device-generation epoch (there is no per-iter
    # host work left to overlap); kept for option-surface compatibility.
    overlap: bool = True
    # measurement-only ablation of the jitted epoch (scripts/bench_item2vec
    # --stagebreak; never set in production): "noscatter" drops the table
    # scatter-adds (keeps gathers + einsums live), "frontonly" drops the
    # whole per-block update body (isolates the subsample/compaction
    # front-end + scan skeleton)
    ablate: str = ""

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
        # corpus layout is static across iterations: flatten + ship ONCE
        flat_all, doc_id = self._flatten_corpus(flat_docs)
        words_per_iter = int(flat_all.size)
        d_flat, d_doc = self._device_corpus(flat_all, doc_id)
        d_keep = jnp.asarray(keep.astype(np.float32))

        w_in = jnp.asarray(self.w_in)
        w_out = jnp.asarray(self.w_out)
        device_tables = self._device_tables()
        row_scales = self._static_row_scales(counts)
        step_fn = self._make_epoch_fn()

        words_done = 0
        total_train_words = max(total_words * o.iters, 1)
        pair_counts = []
        for it in range(o.iters):
            te = time.perf_counter()
            lr_start = max(o.min_lr, o.init_lr *
                           (1 - words_done / total_train_words))
            words_done += words_per_iter
            lr_end = max(o.min_lr, o.init_lr *
                         (1 - words_done / total_train_words))
            w_in, w_out, n_pairs = step_fn(
                w_in, w_out, *device_tables, *row_scales, d_flat, d_doc,
                d_keep, jnp.float32(lr_start), jnp.float32(lr_end),
                jax.random.key(o.seed * 1000 + it))
            pair_counts.append(n_pairs)
            if o.verbose:
                n_ex = int(n_pairs)             # device sync: honest timing
                log.info("iter %d: %d examples in %.2fs (%.0f/s)", it,
                         n_ex, time.perf_counter() - te,
                         n_ex / max(time.perf_counter() - te, 1e-9))
        if pair_counts:
            self.words_trained += int(np.sum(
                [int(c) for c in pair_counts]))
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
        d_keep = jnp.asarray(keep.astype(np.float32))

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
                flat_c, doc_c = self._flatten_corpus(chunk)
                lr_start = max(o.min_lr, o.init_lr *
                               (1 - words_done / total_train_words))
                words_done += sum(len(c) for c in chunk)
                lr_end = max(o.min_lr, o.init_lr *
                             (1 - words_done / total_train_words))
                if flat_c.size:
                    key = iter_key if chunk_idx == 0 else \
                        jax.random.fold_in(iter_key, chunk_idx)
                    # a corpus that fits ONE chunk pads exactly like
                    # train() (bit-identical streams); mid-stream chunks
                    # bucket to a power of two so every full chunk reuses
                    # one compiled epoch
                    single = chunk_idx == 0 and len(chunk) < batch_docs
                    d_flat, d_doc = self._device_corpus(
                        flat_c, doc_c, bucket=not single)
                    w_in, w_out, n_pairs = step_fn(
                        w_in, w_out, *device_tables, *row_scales,
                        d_flat, d_doc, d_keep,
                        jnp.float32(lr_start), jnp.float32(lr_end), key)
                    self.words_trained += int(n_pairs)
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

    def _block_positions(self) -> int:
        """Centers per corpus block: keeps update rows per block near the
        old pairs-per-batch budget (batch_size), so the collision-cap
        expectations and VMEM working set stay comparable."""
        o = self.opts
        return max(o.batch_size // (2 * o.window), 64)

    def _device_corpus(self, flat: np.ndarray, doc_id: np.ndarray,
                       bucket: bool = False):
        """Pad the flat corpus to a block multiple (-1 = no word) and ship
        it. bucket=True additionally rounds the length up to the next
        power of two so streaming chunks of varying size reuse one compiled
        epoch (compiles through the remote relay cost minutes)."""
        bp = self._block_positions()
        n = flat.size
        target = -(-max(n, 1) // bp) * bp
        if bucket:
            b = bp
            while b < target:
                b *= 2
            target = b
        pad = target - n
        if pad:
            flat = np.concatenate([flat, np.full(pad, -1, np.int32)])
            doc_id = np.concatenate(
                [doc_id, np.full(pad, -1, np.int32)])
        return jnp.asarray(flat), jnp.asarray(doc_id)

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
        """One iteration = ONE jitted dispatch over the device-resident
        corpus: subsample mask → kept-word compaction (one argsort) →
        per-center radii → lax.scan over corpus blocks. Per block the
        [bp, 2w] context matrix comes from contiguous gathers of the
        compacted corpus, logits are MXU einsums, and each center's output
        rows (Huffman path nodes / sampled negatives) receive ONE summed
        update across the center's contexts — ~2w× fewer output-table
        scatter rows than a per-pair layout (the device wall: small-table
        scatters run ~93M rows/s, BENCH_NOTES r3).

        Collision control: a row hit N times in one block gets N summed
        updates (the reference's sequential Hogwild applies them one at a
        time, word2vec.go:198-221); the accumulated per-row step is capped
        at `cap` examples' worth via the STATIC expectation scales
        (_static_row_scales). All table writes are PLAIN masked .at[].add
        scatters — at item2vec vocabs XLA vectorizes them; -1 ids
        contribute nothing. NS note: negatives are drawn per CENTER and
        shared by its ≤2w contexts (the reference draws per pair) — same
        objective in expectation, verified by the neighbor-purity gates.

        Returns (w_in, w_out, n_pairs_trained)."""
        o = self.opts
        is_hs = o.optimizer == "hs"
        is_cbow = o.model == "cbow"
        neg_k = o.negative
        W = o.window
        bp = self._block_positions()
        offs_np = np.asarray([off for off in range(-W, W + 1) if off != 0],
                             np.int32)

        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch(w_in, w_out, tab_a, tab_b, scale_in, scale_out,
                  flat, doc_id, keep, lr_start, lr_end, key):
            n = flat.shape[0]
            n_blocks = n // bp
            k_sub, k_rad = jax.random.split(key)
            word_ok = flat >= 0
            m = word_ok & (jax.random.uniform(k_sub, (n,)) <
                           jnp.take(keep, jnp.maximum(flat, 0)))
            pos = jnp.arange(n, dtype=jnp.int32)
            # stable compaction: kept words first, original order preserved
            ordr = jnp.argsort(jnp.where(m, pos, n + pos))
            n_kept = jnp.sum(m.astype(jnp.int32))
            live = pos < n_kept
            fk = jnp.where(live, jnp.take(flat, ordr), -1)
            dk = jnp.where(live, jnp.take(doc_id, ordr), -2)
            radius = jax.random.randint(k_rad, (n,), 1, W + 1)
            offs_d = jnp.asarray(offs_np)
            abs_offs = jnp.abs(offs_d)
            dim = w_in.shape[1]

            def scatter_rows(tab, ids, rows):
                if o.ablate == "noscatter":
                    # measurement ablation: keep the update computation
                    # live (fold into one lane of row 0) without the
                    # scatter — isolates the scatter cost
                    return tab.at[0, 0].add(jnp.sum(rows[:, :1]) * 1e-20)
                mm = (ids >= 0).astype(jnp.float32)
                return tab.at[jnp.maximum(ids, 0)].add(rows * mm[:, None])

            def body(carry, b):
                if o.ablate == "frontonly":
                    w_in, w_out = carry
                    i0 = b * bp
                    centers = jax.lax.dynamic_slice(fk, (i0,), (bp,))
                    n_ex = jnp.sum((centers >= 0).astype(jnp.int32))
                    w_in = w_in.at[0, 0].add(
                        n_ex.astype(jnp.float32) * 1e-20)
                    return (w_in, w_out), n_ex
                w_in, w_out = carry
                i0 = b * bp
                centers = jax.lax.dynamic_slice(fk, (i0,), (bp,))
                dctr = jax.lax.dynamic_slice(dk, (i0,), (bp,))
                rad = jax.lax.dynamic_slice(radius, (i0,), (bp,))
                idx = (i0 + jnp.arange(bp, dtype=jnp.int32)[:, None]
                       + offs_d[None, :])
                inb = (idx >= 0) & (idx < n)
                idxc = jnp.clip(idx, 0, n - 1)
                cx = jnp.take(fk, idxc)                     # [bp, 2W]
                dcx = jnp.take(dk, idxc)
                valid = (inb & (centers[:, None] >= 0) & (cx >= 0)
                         & (dcx == dctr[:, None])
                         & (rad[:, None] >= abs_offs[None, :]))
                vmask = valid.astype(jnp.float32)
                frac = b.astype(jnp.float32) / jnp.maximum(n_blocks - 1, 1)
                lr = lr_start + (lr_end - lr_start) * frac
                c_safe = jnp.maximum(centers, 0)
                cx_safe = jnp.maximum(cx, 0)

                vs = jnp.take(w_in, cx_safe, axis=0)        # [bp, 2W, D]
                if is_cbow:
                    # input = mean of context vectors; target = center
                    denom = jnp.maximum(vmask.sum(1, keepdims=True), 1.0)
                    has = ((vmask.sum(1) > 0) & (centers >= 0))
                    t_mask = has.astype(jnp.float32)
                    v_eff = ((vs * vmask[..., None]).sum(1)
                             / denom)[:, None, :]           # [bp, 1, D]
                    wmask = t_mask[:, None]                 # [bp, 1]
                else:
                    # skip-gram convention (model.go:48-78): each context
                    # word's input vector trains against the center target
                    v_eff = vs                              # [bp, 2W, D]
                    wmask = vmask

                if is_hs:
                    paths = jnp.take(tab_a, c_safe, axis=0)      # [bp, P]
                    codes = jnp.take(tab_b, c_safe, axis=0)
                    pmask = ((paths >= 0).astype(jnp.float32)
                             * (centers >= 0).astype(jnp.float32)[:, None])
                    p_safe = jnp.maximum(paths, 0)
                    u = jnp.take(w_out, p_safe, axis=0)          # [bp, P, D]
                    z = jnp.einsum("bwd,bpd->bwp", v_eff, u)
                    f = jax.nn.sigmoid(z)
                    g = ((1.0 - codes[:, None, :] - f)
                         * wmask[:, :, None] * pmask[:, None, :] * lr)
                    dv = jnp.einsum("bwp,bpd->bwd", g, u)
                    du = jnp.einsum("bwp,bwd->bpd", g, v_eff)
                    gs_out = jnp.take(scale_out, p_safe)         # [bp, P]
                    w_out = scatter_rows(
                        w_out, jnp.where(pmask > 0, p_safe, -1).reshape(-1),
                        (du * gs_out[..., None]).reshape(-1, dim))
                else:
                    kkey = jax.random.fold_in(key, b)
                    negs = jnp.take(tab_a, jax.random.randint(
                        kkey, (bp, neg_k), 0, tab_a.shape[0]))   # [bp, K]
                    ids = jnp.concatenate([c_safe[:, None], negs], 1)
                    labels = jnp.concatenate(
                        [jnp.ones((bp, 1), jnp.float32),
                         jnp.zeros((bp, neg_k), jnp.float32)], 1)
                    kmask = (centers >= 0).astype(jnp.float32)[:, None]
                    u = jnp.take(w_out, ids, axis=0)          # [bp, K+1, D]
                    z = jnp.einsum("bwd,bkd->bwk", v_eff, u)
                    g = ((labels[:, None, :] - jax.nn.sigmoid(z))
                         * wmask[:, :, None] * kmask[:, None, :] * lr)
                    dv = jnp.einsum("bwk,bkd->bwd", g, u)
                    du = jnp.einsum("bwk,bwd->bkd", g, v_eff)
                    gs_out = jnp.take(scale_out, ids)
                    w_out = scatter_rows(
                        w_out, jnp.where(kmask > 0, ids, -1).reshape(-1),
                        (du * gs_out[..., None]).reshape(-1, dim))

                sc_in = jnp.take(scale_in, cx_safe)              # [bp, 2W]
                if is_cbow:
                    upd = ((dv[:, 0, :] / denom)[:, None, :]
                           * (vmask * sc_in)[..., None])
                else:
                    upd = dv * (vmask * sc_in)[..., None]
                w_in = scatter_rows(
                    w_in, jnp.where(valid, cx_safe, -1).reshape(-1),
                    upd.reshape(-1, dim))
                n_ex = jnp.sum((wmask > 0).astype(jnp.int32))
                return (w_in, w_out), n_ex

            (w_in, w_out), counts = jax.lax.scan(
                body, (w_in, w_out), jnp.arange(n_blocks))
            return w_in, w_out, jnp.sum(counts)

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
