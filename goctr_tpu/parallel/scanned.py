"""Device-resident scanned trainer for SparseCTR — the single-chip perf path.

The per-batch sharded trainer (parallel/sparse_trainer.py) round-trips the
host every minibatch: fine under a local PJRT client, dominated by dispatch
latency through a remote relay. This trainer is the whole-dataset-on-device
counterpart of models/trainer.py for raw-id samples: ids + dense blocks live
in HBM, one jitted `epoch_step` lax.scan's over every minibatch, and the
host sees exactly one dispatch per epoch.

The second difference is the embedding-table update. Differentiating through
`jnp.take(table, ids)` materializes a dense [V, D] cotangent (plus [V, D]
Adam moments) — 3 extra table-sized buffers, which caps vocab at a fraction
of HBM. Here the table never enters autodiff: the loss is differentiated
w.r.t. the *gathered rows* (SparseCTR.apply_pooled), and the table is
updated by scatter-add with a row-wise optimizer:

  * ``sgd``      — table.at[ids].add(-lr · g_row). Exact even with duplicate
                   ids in a batch (scatter-add sums their gradients).
  * ``adagrad``  — DLRM-standard row-wise AdaGrad with a single [V] second-
                   moment accumulator (40 MB at vocab=10M vs 2× [V, D] for
                   Adam). Duplicate ids within one batch race Hogwild-style
                   (each duplicate scales by the post-update accumulator) —
                   the same semantics the reference accepts in its lock-free
                   word2vec updates (/root/reference/word2vec.go:168).

Total table-attributable HBM: [V, D] + [V] — vocab 10M × dim 64 trains on a
single v5e with room for a 5M-row dataset (BASELINE config #5 scale; the
reference's embedding story is a frozen in-RAM Go map, rcmd.go:501-531).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.optim.optimizers import make_solver
from goctr_tpu.optim.schedules import make_schedule
from goctr_tpu.parallel.sparse_ctr import SparseCTR
from goctr_tpu.parallel.sparse_trainer import SparseSample
from goctr_tpu.parallel.table_opt import TableOptConfig

__all__ = [
    "TableOptConfig", "TrainedScanned", "train_sparse_scanned",
    "save_scanned_checkpoint", "load_scanned_checkpoint",
    "model_bytes_per_example", "model_flops_per_example", "table_pad_rows",
]

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainedScanned:
    model: SparseCTR
    dense_params: dict
    table: jax.Array
    loss_curve: list[float]
    epoch_times: list[float]
    opt_state: object = dataclasses.field(default=None, repr=False)
    acc: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    # max per-batch count of unique rows dropped by the fused compaction
    # cap (TableOptConfig.compact_cap); 0 = every batch fit — if ever
    # nonzero, grow the cap (those rows lost their updates)
    update_overflow_max: int = 0
    # >1: `table` is grouped packed lines [ceil(V/G), 128] (very large
    # small-D vocabs stay in line layout end-to-end — a [V, D] device
    # array would tile-pad D to 128 lanes, 51 GB at 100M x 16); predict
    # and checkpoints handle the layout
    packed_group: int = 1

    @property
    def params(self) -> dict:
        """SparseCTR-compatible params pytree (for apply/predict paths)."""
        return dict(self.dense_params, item_table=self.table)

    def predict(self, sample: SparseSample, batch_size: int = 32768
                ) -> np.ndarray:
        model = self.model
        cd = model.compute_dtype

        G = self.packed_group
        D = model.emb_dim

        @jax.jit
        def fwd(dense, table, prof, bids, iids, ctx):
            def rows_of(ids):
                if G == 1:
                    return jnp.take(table, ids, axis=0).astype(cd)
                lines = jnp.take(table, ids // G, axis=0)
                l3 = lines[..., :G * (D + 1)].reshape(
                    ids.shape + (G, D + 1))
                oh = jax.nn.one_hot(ids % G, G, dtype=jnp.float32)
                return jnp.einsum("...g,...gd->...d", oh,
                                  l3)[..., :D].astype(cd)
            emb_b = rows_of(jnp.maximum(bids, 0))
            emb_i = rows_of(iids)
            mask = (bids >= 0).astype(jnp.float32)
            return jax.nn.sigmoid(model.apply_pooled(
                dense, prof, emb_b, emb_i, ctx, mask, train=False))

        n = sample.rows
        out = np.empty(n, np.float32)
        bs = min(batch_size, n)
        for s in range(0, n, bs):
            e = min(s + bs, n)
            pad = bs - (e - s)
            def p(a, fill=0):
                x = a[s:e]
                if pad:
                    x = np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
                return x
            scores = fwd(self.dense_params, self.table, p(sample.user_profile),
                         p(sample.behavior_ids, -1), p(sample.item_ids),
                         p(sample.ctx))
            out[s:e] = np.asarray(scores)[:e - s]
        return out


# vocab threshold above which grouped-fused tables stay in line layout
# end-to-end (init, train, predict, checkpoint)
GROUPED_RESIDENT_MIN_V = 4_000_000

_SCAT_DNUMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,))


def table_pad_rows(batch_size: int, behavior_len: int) -> int:
    """Junk pad rows the dedup/fused updates need beyond the vocab: one
    shared row for all -1 behavior pads (they dedup into a single zero-sum
    run, ops/segsum.py) + distinct in-range targets for non-final run
    positions (n) + margin, with n rounded up to the fused kernel's grid
    multiple."""
    from goctr_tpu.ops.pallas.row_optimizer import ROWS_PER_STEP
    n = batch_size * (behavior_len + 1)
    n = -(-n // ROWS_PER_STEP) * ROWS_PER_STEP
    return n + 2


def _table_update(table: jax.Array, acc: jax.Array, ids_flat: jax.Array,
                  g_flat: jax.Array, topt: TableOptConfig, V: int):
    """Apply one batch's row gradients to the table (+ adagrad accumulator).
    Invalid ids (< 0, i.e. behavior padding) contribute nothing. `V` is the
    true vocab; in dedup mode the physical table has table_pad_rows() extra
    junk rows past V. Returns (table, acc, overflow) where overflow counts
    unique rows whose update was DROPPED by the fused compaction cap
    (always 0 unless topt.compact_cap > 0 undersizes a batch)."""
    from goctr_tpu.ops.scatter import scatter_add_rows

    no_over = jnp.zeros((), jnp.int32)
    valid = (ids_flat >= 0).astype(jnp.float32)
    g_flat = g_flat * valid[:, None]

    if topt.update_mode == "plain":
        safe = jnp.maximum(ids_flat, 0)
        if topt.kind == "adagrad":
            row_sq = jnp.sum(g_flat * g_flat, axis=1) * valid
            acc = acc.at[safe].add(row_sq, mode="drop")
            scale = topt.lr * jax.lax.rsqrt(
                jnp.take(acc, safe) + topt.eps) * valid
        else:
            scale = topt.lr * valid
        table = table.at[safe].add(-scale[:, None] * g_flat, mode="drop")
        return table, acc, no_over

    if topt.update_mode == "sorted":
        order = jnp.argsort(ids_flat)
        s_ids = jnp.take(ids_flat, order)      # pads (-1) sort first → dropped
        s_g = jnp.take(g_flat, order, axis=0)
        if topt.kind == "adagrad":
            row_sq = jnp.sum(s_g * s_g, axis=1)
            acc = scatter_add_rows(acc[:, None], s_ids, row_sq[:, None],
                                   sorted_ids=True)[:, 0]
            scale = topt.lr * jax.lax.rsqrt(
                jnp.take(acc, jnp.maximum(s_ids, 0)) + topt.eps)
        else:
            scale = jnp.full_like(s_ids, topt.lr, jnp.float32)
        table = scatter_add_rows(table, s_ids, -scale[:, None] * s_g,
                                 sorted_ids=True)
        return table, acc, no_over

    if topt.update_mode == "fused2":
        # diff-mode: sort + ONE blockwise cumsum; the kernel recovers each
        # run's summed gradient as the diff of consecutive run-end cumsum
        # rows (prev_c register) — no boundary gather, no cummax, no
        # zeroing, no grad packing, no junk table rows
        # (ops/pallas/row_optimizer.apply_csum_updates).
        from goctr_tpu.ops.pallas.row_optimizer import apply_csum_updates
        from goctr_tpu.ops.segsum import _cumsum_rows
        n0 = ids_flat.shape[0]
        n_to = -(-n0 // 1024) * 1024
        ids_clean = jnp.where(ids_flat >= 0, ids_flat, V)
        if n_to > n0:
            ids_clean = jnp.concatenate(
                [ids_clean, jnp.full((n_to - n0,), V, ids_clean.dtype)])
            g_flat = jnp.concatenate(
                [g_flat, jnp.zeros((n_to - n0, g_flat.shape[1]),
                                   g_flat.dtype)])
        order = jnp.argsort(ids_clean)
        s_ids = jnp.take(ids_clean, order)
        c = _cumsum_rows(jnp.take(g_flat, order, axis=0))
        table = apply_csum_updates(table, s_ids, c, lr=topt.lr,
                                   d=g_flat.shape[1], kind=topt.kind,
                                   eps=topt.eps, skip_ge=V)
        return table, acc, no_over

    if topt.update_mode == "runfused":
        # v2: sort with duplicates and feed the sorted-run fused kernel —
        # run summing happens IN the kernel (VMEM accumulation per run, one
        # RMW per unique row), so the cumsum/boundary-gather/pack pipeline
        # and the junk-row table region all disappear
        # (ops/pallas/run_optimizer.py). Pads map to id V (sorted last,
        # skipped by skip_ge) — the table is exactly [V, 128].
        from goctr_tpu.ops.pallas.run_optimizer import apply_run_updates
        n0 = ids_flat.shape[0]
        n_to = -(-n0 // 1024) * 1024
        ids_clean = jnp.where(ids_flat >= 0, ids_flat, V)
        if n_to > n0:
            ids_clean = jnp.concatenate(
                [ids_clean, jnp.full((n_to - n0,), V, ids_clean.dtype)])
            g_flat = jnp.concatenate(
                [g_flat, jnp.zeros((n_to - n0, g_flat.shape[1]),
                                   g_flat.dtype)])
        order = jnp.argsort(ids_clean)
        s_ids = jnp.take(ids_clean, order)
        s_rows = jnp.take(g_flat, order, axis=0)
        table = apply_run_updates(table, s_ids, s_rows, lr=topt.lr,
                                  d=s_rows.shape[1], kind=topt.kind,
                                  eps=topt.eps, skip_ge=V)
        return table, acc, no_over

    if topt.update_mode not in ("dedup", "fused"):
        raise ValueError(f"unknown update_mode {topt.update_mode!r}")

    # dedup/fused: sum duplicate rows → one collision-free write per unique
    # id, which also makes adagrad EXACT (the accumulated row gradient is
    # squared once per batch — standard DLRM row-wise adagrad). The summing
    # is SCATTER-FREE (ops/segsum.py: sort + blockwise cumsum + one boundary
    # gather) because jax.ops.segment_sum lowers to the same serial XLA
    # scatter loop this path exists to avoid — measured as expensive as the
    # final scatter itself (190 ms/1M rows, BENCH_NOTES r3). The output
    # stays position-aligned: position i carries its run's full sum iff it
    # is the run's last position (target = the id), else zeros targeted at
    # a DISTINCT junk id past the vocab. In `dedup` mode the table/acc
    # carry `n + 2` junk pad rows (see V_ALLOC in train_sparse_scanned) so
    # every scatter target is a real in-range row: scatters run with
    # strictly-true unique promises and PROMISE_IN_BOUNDS, never the
    # OOB-drop path (which faulted the TPU worker at 10M-vocab scale,
    # BENCH_NOTES.md). In `fused` mode NO junk rows are allocated: the
    # kernel's skip_ge gate skips junk targets pre-DMA and the jnp fallback
    # drops their writes, so junk ids may point past the table.
    from goctr_tpu.ops.pallas.row_optimizer import ROWS_PER_STEP
    from goctr_tpu.ops.segsum import _cumsum_rows, segment_rows_dedup
    n0 = ids_flat.shape[0]
    n_to = -(-n0 // ROWS_PER_STEP) * ROWS_PER_STEP
    overflow = no_over

    if topt.update_mode == "fused" and topt.compact_cap:
        # compacted front-end: instead of the position-aligned [n] stream
        # (~83% junk slots at headline zipf traffic, each still costing the
        # kernel a scalar-loop step + the pack a 128-lane row), compact to
        # <=cap (id, run-sum) rows before the optimizer. Two impls:
        #   compact_impl="kernel" (default where eligible): ONE Pallas pass
        #     fuses cumsum + run-end selection (exact 0/1 MXU matmuls) +
        #     diff + pack (ops/pallas/compact.py) — replaces ~52 ms of XLA
        #     stages at the headline batch (BENCH_NOTES r5);
        #   compact_impl="xla": the r4 rank-sort path (any vocab size).
        ids_clean = jnp.where(ids_flat >= 0, ids_flat, V)
        if n_to > n0:
            ids_clean = jnp.concatenate(
                [ids_clean, jnp.full((n_to - n0,), V, ids_clean.dtype)])
            g_flat = jnp.concatenate(
                [g_flat,
                 jnp.zeros((n_to - n0, g_flat.shape[1]), g_flat.dtype)])
        D_ = g_flat.shape[1]
        order = jnp.argsort(ids_clean)
        s_ids = jnp.take(ids_clean, order)
        g_s = jnp.take(g_flat, order, axis=0)
        capr = min(-(-topt.compact_cap // ROWS_PER_STEP) * ROWS_PER_STEP,
                   n_to)
        use_kernel = (topt.compact_impl == "kernel" and V < (1 << 24)
                      and D_ < 128)
        if use_kernel:
            from goctr_tpu.ops.pallas.compact import compact_runsums_block
            tgt, rows_packed, overflow = compact_runsums_block(
                s_ids, g_s, V, capr, interpret=topt.pallas_interpret)
            rows = rows_packed[:, :D_]
        else:
            c = _cumsum_rows(g_s)
            is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                                      jnp.ones((1,), bool)])
            real_end = is_end & (s_ids < V)
            pos = jnp.arange(n_to, dtype=jnp.int32)
            sel = jnp.argsort(jnp.where(real_end, pos, n_to + pos))[:capr]
            sel_real = jnp.take(real_end, sel)
            c_sel = jnp.take(c, sel, axis=0)
            prev = jnp.concatenate(
                [jnp.zeros((1, D_), c.dtype), c_sel[:-1]])
            rows = jnp.where(sel_real[:, None], c_sel - prev, 0.0)
            rows_packed = None
            tgt = jnp.where(sel_real, jnp.take(s_ids, sel),
                            V + 1 + pos[:capr]).astype(jnp.int32)
            overflow = jnp.maximum(
                jnp.sum(real_end.astype(jnp.int32)) - capr, 0)
    else:
        rows_packed = None
        tgt, rows = segment_rows_dedup(ids_flat, g_flat, V, pad_to=n_to)

    if topt.update_mode == "fused":
        from goctr_tpu.ops.pallas.row_optimizer import group_size
        D = rows.shape[1]
        G = group_size(D)
        if G == 1:
            # table is PACKED [V, 128] (w | acc | pad); one Pallas RMW
            # pass applies both the weight step and the adagrad
            # accumulator — or, rmw_impl="split", take-read + vectorized
            # math + write-only scatter (see TableOptConfig)
            from goctr_tpu.ops.pallas.row_optimizer import (
                apply_row_updates, apply_row_updates_split, pack_grads)
            impl = (apply_row_updates_split
                    if topt.rmw_impl == "split" else apply_row_updates)
            gp = rows_packed if rows_packed is not None else pack_grads(rows)
            table = impl(table, tgt, gp,
                         lr=topt.lr, d=D, kind=topt.kind, eps=topt.eps,
                         skip_ge=V)
            return table, acc, overflow
        # grouped lines (D small, e.g. BASELINE #5's 100M x 16): distinct
        # row targets may share a 128-lane line, so lane-place each row's
        # (sum | ||sum||^2) into its group slot, accumulate same-line
        # rows with a second scatter-free run-sum pass over LINE ids, and
        # RMW once per unique line (ops/pallas/row_optimizer.py grouped
        # kernel; per-group adagrad via the MXU spread matmul).
        from goctr_tpu.ops.pallas.row_optimizer import (
            LANES, apply_line_updates, apply_line_updates_split,
            packed_lines)
        from goctr_tpu.ops.segsum import sorted_run_sums
        line_impl = (apply_line_updates_split
                     if topt.rmw_impl == "split" else apply_line_updates)
        L = packed_lines(V, D)
        n = tgt.shape[0]
        real = tgt < V
        nsq = jnp.sum(rows * rows, axis=1, keepdims=True)
        oh = (jax.nn.one_hot(tgt % G, G, dtype=jnp.float32)
              * real[:, None])                              # [n, G]
        block = oh[:, :, None] * jnp.concatenate(
            [rows, nsq], axis=1)[:, None, :]                # [n, G, D+1]
        upd = jnp.zeros((n, LANES), jnp.float32)
        upd = upd.at[:, :G * (D + 1)].set(block.reshape(n, G * (D + 1)))
        pos = jnp.arange(n, dtype=jnp.int32)
        lkey = jnp.where(real, (tgt // G).astype(jnp.int32), L + pos)
        order = jnp.argsort(lkey)
        ltgt, lrows = sorted_run_sums(
            jnp.take(lkey, order), jnp.take(upd, order, axis=0),
            junk_base=L + n + 1)
        table = line_impl(table, ltgt.astype(jnp.int32), lrows,
                          lr=topt.lr, d=D, kind=topt.kind,
                          eps=topt.eps, skip_ge=L)
        return table, acc, overflow

    in_bounds = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS
    if topt.kind == "adagrad":
        row_sq = jnp.sum(rows * rows, axis=1)
        acc = jax.lax.scatter_add(
            acc[:, None], tgt[:, None], row_sq[:, None], _SCAT_DNUMS,
            unique_indices=True, mode=in_bounds)[:, 0]
        # junk rows: acc stays 0 → scale finite, rows exactly 0 → no-op
        scale = topt.lr * jax.lax.rsqrt(jnp.take(acc, tgt) + topt.eps)
    else:
        scale = jnp.full(tgt.shape, topt.lr, jnp.float32)
    table = jax.lax.scatter_add(
        table, tgt[:, None], -scale[:, None] * rows, _SCAT_DNUMS,
        unique_indices=True, mode=in_bounds)
    return table, acc, no_over


def train_sparse_scanned(model: SparseCTR, sample: SparseSample,
                         cfg: Optional[TrainerConfig] = None,
                         table_opt: Optional[TableOptConfig] = None,
                         resume_from: Optional[TrainedScanned] = None,
                         ) -> TrainedScanned:
    """Single-device scanned training. For multi-chip table sharding use
    parallel/sparse_trainer.py; this path maximizes one chip. Pass a prior
    TrainedScanned as resume_from for true mid-training resume (params,
    table, adagrad accumulator, and dense optimizer state all restore).
    NOTE: resuming a grouped-resident result (packed_group > 1) into the
    same fused mode reuses its [L, 128] line table ZERO-COPY — with
    donation on, training consumes resume_from.table (a defensive copy
    would transiently double table HBM: 14.6 GB at 100M x 16)."""
    cfg = cfg or TrainerConfig()
    topt = table_opt or TableOptConfig()
    if topt.kind not in ("adagrad", "sgd"):
        raise ValueError(f"unknown table optimizer {topt.kind!r}")
    n = sample.rows
    bs = min(cfg.batch_size, n)
    n_batches = -(-n // bs)
    n_pad = n_batches * bs
    T = sample.behavior_ids.shape[1]
    D = model.emb_dim
    V = model.item_vocab

    # ---- device-resident dataset (padded tail rows carry weight 0) -------
    def pad_rows(a: np.ndarray, fill=0) -> jax.Array:
        if n_pad > n:
            a = np.concatenate(
                [a, np.full((n_pad - n,) + a.shape[1:], fill, a.dtype)])
        return jnp.asarray(np.ascontiguousarray(a))

    d_prof = pad_rows(sample.user_profile.astype(np.float32))
    d_bids = pad_rows(sample.behavior_ids.astype(np.int32), fill=-1)
    d_iids = pad_rows(sample.item_ids.astype(np.int32))
    d_ctx = pad_rows(sample.ctx.astype(np.float32))
    d_y = pad_rows(np.asarray(sample.labels, np.float32).ravel())
    d_w = jnp.concatenate([jnp.ones((n,), jnp.float32),
                           jnp.zeros((n_pad - n,), jnp.float32)])

    # ---- params: dense tower via optax, table via row-wise updates -------
    key = jax.random.key(cfg.seed)
    key, k_init = jax.random.split(key)
    k_table, k_mlp = jax.random.split(k_init)
    dims = (model.concat_dim,) + tuple(model.hidden) + (1,)
    from goctr_tpu.models.base import init_linear
    mkeys = jax.random.split(k_mlp, len(dims) - 1)
    resumed_group = (resume_from.packed_group
                     if resume_from is not None else 1)
    if resume_from is not None:
        dense_params = resume_from.dense_params
        table = resume_from.table
        acc = (resume_from.acc if resume_from.acc is not None
               else jnp.zeros((V,), jnp.float32))
        key = jax.random.fold_in(key, len(resume_from.loss_curve))
    else:
        dense_params = {
            "att0": jnp.ones((model.behavior_len,), jnp.float32),
            "mlp": [init_linear(k, (dims[i], dims[i + 1]), "glorot")
                    for i, k in enumerate(mkeys)],
            "bias": [jnp.zeros((d,), jnp.float32) for d in dims[1:]],
        }
        from goctr_tpu.ops.pallas.row_optimizer import group_size as _gs
        if (topt.update_mode == "fused" and _gs(D) > 1
                and V >= GROUPED_RESIDENT_MIN_V):
            # very large small-D vocab: a [V, D] device array tile-pads
            # its 16 lanes to 128 (51 GB at 100M x 16) — generate the
            # grouped line layout directly and keep it packed end-to-end
            # (predict + checkpoints handle the layout; init stream
            # differs from the [V, D] draw, same distribution)
            table = jnp.zeros((0, D), jnp.float32)
        else:
            table = jax.random.normal(k_table, (V, D), jnp.float32) * 0.01
        acc = jnp.zeros((V,), jnp.float32)  # adagrad moment (unused for sgd)

    # dedup mode scatters into distinct in-range junk rows past the vocab
    # (see _table_update); physically extend table/acc once here. The
    # packed modes (fused/runfused/fused2) need NO junk rows: junk/pad
    # targets are skipped pre-DMA by skip_ge (or dropped by the fallback).
    fused = topt.update_mode in ("fused", "runfused", "fused2")
    if fused and D >= 128:
        raise ValueError(f"update_mode={topt.update_mode!r} requires "
                         "emb_dim < 128 (weights+acc pack into one "
                         "128-lane row)")
    from goctr_tpu.ops.pallas.row_optimizer import group_size
    # grouped lines: `fused` at small D packs G = 128//(D+1) rows per
    # 128-lane line (BASELINE #5: 100M x 16 → 7.3 GB instead of 51 GB)
    G = group_size(D) if topt.update_mode == "fused" else 1
    # in-memory resume of a grouped-resident result (ADVICE r4): the table
    # is already [L, 128] lines and acc is the empty placeholder — reuse
    # the line layout directly when it matches, unpack first otherwise
    if resumed_group > 1 and not (fused and G == resumed_group):
        from goctr_tpu.ops.pallas.row_optimizer import unpack_table_grouped
        table, acc = unpack_table_grouped(table, V, D)
        resumed_group = 1
    v_alloc = V + (table_pad_rows(bs, T)
                   if topt.update_mode == "dedup" else 0)
    if topt.update_mode == "dedup" and table.shape[0] < v_alloc:
        table = jnp.concatenate(
            [table, jnp.zeros((v_alloc - table.shape[0], D), jnp.float32)])
        acc = jnp.concatenate(
            [acc, jnp.zeros((v_alloc - acc.shape[0],), jnp.float32)])
    if fused:
        if G > 1:
            from goctr_tpu.ops.pallas.row_optimizer import (
                init_packed_table_grouped, pack_table_grouped)
            if resumed_group == G:
                pass                      # already in line layout
            elif table.shape[0] == 0:     # direct grouped init (above)
                table = init_packed_table_grouped(k_table, V, D)
            else:
                table = pack_table_grouped(table, acc)
        else:
            from goctr_tpu.ops.pallas.row_optimizer import pack_table
            table = pack_table(table, acc)    # [V, 128]: w | acc | pad
        acc = jnp.zeros((0,), jnp.float32)    # lives inside the packed table

    schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t)
    solver = make_solver(
        cfg.solver, schedule, l2=cfg.l2, weight_decay=cfg.weight_decay,
        momentum=cfg.momentum, beta1=cfg.beta1, beta2=cfg.beta2,
        epsilon=cfg.epsilon)
    opt_state = (resume_from.opt_state
                 if resume_from is not None and resume_from.opt_state
                 is not None else solver.init(dense_params))
    cd = model.compute_dtype

    def loss_fn(dense, emb_b, emb_i, prof, ctx, mask, yb, wb, dkey):
        logits = model.apply_pooled(dense, prof, emb_b, emb_i, ctx, mask,
                                    train=True, key=dkey)
        losses = (jnp.maximum(logits, 0) - logits * yb +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.sum(losses * wb) / jnp.maximum(jnp.sum(wb), 1.0)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

    # dataset buffers are explicit jit args (never HLO constants); only
    # mutable state is donated — the relay's AOT compiler handles plain-array
    # donation fine (NamedSharding donation is the thing that hangs it)
    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def epoch_step(dense, opt_state, table, acc,
                   prof, bids, iids, ctx, y, w, epoch_key):
        perm_key, drop_key = jax.random.split(epoch_key)
        if cfg.shuffle:
            perm = jax.random.permutation(perm_key, n_pad)
        else:
            perm = jnp.arange(n_pad)
        perm = perm.reshape(n_batches, bs)

        def body(carry, batch):
            dense, opt_state, table, acc = carry
            idx, b = batch
            b_prof = jnp.take(prof, idx, axis=0)
            b_bids = jnp.take(bids, idx, axis=0)
            b_iids = jnp.take(iids, idx)
            b_ctx = jnp.take(ctx, idx, axis=0)
            b_y = jnp.take(y, idx)
            b_w = jnp.take(w, idx)

            # fused mode gathers packed 128-lane rows and lane-slices the
            # D weight lanes. Measured at V=10M, n=540k (BENCH_NOTES r3):
            #   take  — jnp.take full packed rows, 29.5 GB/s (default)
            #   pallas — ring-DMA row gather (ops/pallas/row_gather.py),
            #            13.5 GB/s (scalar-core DMA-issue bound)
            #   xla   — lax.gather with (1, D) slices from the [V, 128]
            #           operand: 0.2 GB/s (partial-row slices defeat the
            #           fast row-gather path) — kept only as the A/B record
            # take/pallas both materialize [n, 128] before the :D slice —
            # identical memory; r2's OOM fear about take was really the
            # scan-carry double-buffer, fixed by donation.
            def rows_of(ids):
                if not fused:
                    return jnp.take(table, ids, axis=0).astype(cd)
                if G > 1:
                    # grouped lines: gather the full 128-lane line, then
                    # select the id's group slot with a tiny one-hot
                    # contraction (vectorized; a lane-offset gather would
                    # hit the 0.2 GB/s partial-row path, BENCH_NOTES r3)
                    lines = jnp.take(table, ids // G, axis=0)
                    l3 = lines[..., :G * (D + 1)].reshape(
                        ids.shape + (G, D + 1))
                    oh = jax.nn.one_hot(ids % G, G, dtype=jnp.float32)
                    emb = jnp.einsum("...g,...gd->...d", oh, l3)
                    return emb[..., :D].astype(cd)
                if topt.gather_impl == "take":
                    return jnp.take(table, ids, axis=0)[..., :D].astype(cd)
                if topt.gather_impl == "pallas":
                    from goctr_tpu.ops.pallas.row_gather import (
                        ROWS_PER_STEP as GR, gather_rows_packed)
                    flat = ids.reshape(-1)
                    m = flat.shape[0]
                    pad = -(-m // GR) * GR - m
                    if pad:
                        flat = jnp.concatenate(
                            [flat, jnp.zeros((pad,), flat.dtype)])
                    r = gather_rows_packed(table, flat)[:m, :D]
                    return r.reshape(ids.shape + (D,)).astype(cd)
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(ids.ndim,), collapsed_slice_dims=(0,),
                    start_index_map=(0,))
                r = jax.lax.gather(
                    table, ids[..., None], dn, slice_sizes=(1, D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
                return r.astype(cd)

            if topt.sorted_gather:
                flat = jnp.concatenate([b_bids.reshape(-1), b_iids])
                order = jnp.argsort(flat)
                s_ids = jnp.maximum(jnp.take(flat, order), 0)
                inv = jnp.zeros_like(order).at[order].set(
                    jnp.arange(order.shape[0]))
                emb_flat = jnp.take(rows_of(s_ids), inv, axis=0)
                nb = bs * sample.behavior_ids.shape[1]
                emb_b = emb_flat[:nb].reshape(bs, -1, D)
                emb_i = emb_flat[nb:]
            else:
                emb_b = rows_of(jnp.maximum(b_bids, 0))
                emb_i = rows_of(b_iids)
            mask = (b_bids >= 0).astype(jnp.float32)
            dkey = jax.random.fold_in(drop_key, b)
            loss, (g_dense, g_b, g_i) = grad_fn(
                dense, emb_b, emb_i, b_prof, b_ctx, mask, b_y, b_w, dkey)

            updates, opt_state = solver.update(g_dense, opt_state, dense)
            dense = jax.tree.map(lambda p, u: p + u, dense, updates)

            # ---- sparse table update: scatter-add, no [V, D] gradient ----
            ids_flat = jnp.concatenate([b_bids.reshape(-1), b_iids])
            g_flat = jnp.concatenate(
                [g_b.reshape(-1, D), g_i]).astype(jnp.float32)
            table, acc, over = _table_update(table, acc, ids_flat, g_flat,
                                             topt, V)
            return (dense, opt_state, table, acc), (loss, over)

        (dense, opt_state, table, acc), (losses, overs) = jax.lax.scan(
            body, (dense, opt_state, table, acc),
            (perm, jnp.arange(n_batches)))
        return dense, opt_state, table, acc, jnp.mean(losses), \
            jnp.max(overs)

    best, no_improve = float("inf"), 0
    update_overflow_max = 0
    loss_curve: list[float] = []
    epoch_times: list[float] = []
    for epoch in range(cfg.epochs):
        te = time.perf_counter()
        key, ekey = jax.random.split(key)
        dense_params, opt_state, table, acc, cost, over = epoch_step(
            dense_params, opt_state, table, acc,
            d_prof, d_bids, d_iids, d_ctx, d_y, d_w, ekey)
        cost = float(cost)                      # device sync: honest timing
        over = int(over)
        if over > update_overflow_max:
            update_overflow_max = over
            log.warning(
                "fused compact_cap overflow: %d unique rows dropped in a "
                "batch — raise TableOptConfig.compact_cap (currently %d)",
                over, topt.compact_cap)
        epoch_times.append(time.perf_counter() - te)
        loss_curve.append(cost)
        if cfg.verbose:
            log.info("epoch %d | cost %.6f | %.2fs", epoch, cost,
                     epoch_times[-1])
        if cost < best - cfg.tol:
            best, no_improve = cost, 0
        else:
            no_improve += 1
        if cfg.early_stop and no_improve >= cfg.early_stop:
            break

    if resume_from is not None:
        loss_curve = resume_from.loss_curve + loss_curve
    packed_group = 1
    if fused:
        if G > 1:
            if V >= GROUPED_RESIDENT_MIN_V:
                packed_group = G          # stays in line layout end-to-end
            else:
                from goctr_tpu.ops.pallas.row_optimizer import (
                    unpack_table_grouped)
                table, acc = unpack_table_grouped(table, V, D)
        else:
            from goctr_tpu.ops.pallas.row_optimizer import unpack_table
            table, acc = unpack_table(table, D)   # external artifact
    return TrainedScanned(model=model, dense_params=dense_params, table=table,
                          loss_curve=loss_curve, epoch_times=epoch_times,
                          opt_state=opt_state, acc=acc,
                          update_overflow_max=update_overflow_max,
                          packed_group=packed_group)


def save_scanned_checkpoint(path, trained: TrainedScanned,
                            trainer_config: Optional[TrainerConfig] = None,
                            ) -> None:
    """npz+json checkpoint of a TrainedScanned (params, table, adagrad
    accumulator, dense optimizer state) — true mid-training resume for the
    sparse flagship, same tier as models/io.save_checkpoint."""
    import json
    from pathlib import Path

    from goctr_tpu.models.io import _flatten_params

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    m = trained.model
    meta = {
        "model_config": {
            "item_vocab": m.item_vocab, "emb_dim": m.emb_dim,
            "u_profile_dim": m.u_profile_dim, "ctx_dim": m.ctx_dim,
            "behavior_len": m.behavior_len, "hidden": list(m.hidden),
            "activation": m.activation, "dropout_rate": m.dropout_rate,
            "lookup_dedup_cap": m.lookup_dedup_cap,
        },
        "loss_curve": trained.loss_curve,
        "trainer_config": (dataclasses.asdict(trainer_config)
                           if trainer_config is not None else None),
    }
    (path / "meta.json").write_text(json.dumps(meta))
    np.savez(path / "dense.npz", **_flatten_params(trained.dense_params))
    # trim dedup-mode junk pad rows: checkpoints carry exactly the vocab
    v = m.item_vocab
    if trained.packed_group > 1:
        from goctr_tpu.ops.pallas.row_optimizer import (
            unpack_table_grouped_np)
        w, a = unpack_table_grouped_np(np.asarray(trained.table), v,
                                       m.emb_dim)
        np.savez(path / "table.npz", table=w, acc=a)
    else:
        np.savez(path / "table.npz", table=np.asarray(trained.table[:v]),
                 acc=np.asarray(trained.acc[:v]) if trained.acc is not None
                 else np.zeros(0, np.float32))
    if trained.opt_state is not None:
        leaves = jax.tree.leaves(trained.opt_state)
        np.savez(path / "opt_state.npz",
                 **{str(i): np.asarray(x) for i, x in enumerate(leaves)})


def load_scanned_checkpoint(path) -> TrainedScanned:
    import json
    from pathlib import Path

    from goctr_tpu.models.io import _unflatten_params

    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    mc = dict(meta["model_config"])
    mc["hidden"] = tuple(mc["hidden"])
    model = SparseCTR(**mc)
    with np.load(path / "dense.npz") as z:
        dense = _unflatten_params(dict(z.items()))
    with np.load(path / "table.npz") as z:
        table = jnp.asarray(z["table"])
        acc = jnp.asarray(z["acc"]) if z["acc"].size else None

    opt_state = None
    tc = meta.get("trainer_config")
    opt_path = path / "opt_state.npz"
    if opt_path.exists() and tc is not None:
        cfg = TrainerConfig(**tc)
        schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t)
        solver = make_solver(
            cfg.solver, schedule, l2=cfg.l2, weight_decay=cfg.weight_decay,
            momentum=cfg.momentum, beta1=cfg.beta1, beta2=cfg.beta2,
            epsilon=cfg.epsilon)
        template = solver.init(dense)
        treedef = jax.tree.structure(template)
        with np.load(opt_path) as z:
            leaves = [jnp.asarray(z[str(i)]) for i in range(len(z.files))]
        opt_state = jax.tree.unflatten(treedef, leaves)

    return TrainedScanned(model=model, dense_params=dense, table=table,
                          loss_curve=meta["loss_curve"], epoch_times=[],
                          opt_state=opt_state, acc=acc)


def model_bytes_per_example(model: SparseCTR, T: int,
                            update_mode: str = "dedup",
                            real_frac: float = 1.0,
                            compact_frac: float = 0.0) -> float:
    """Analytic HBM bytes per example for the scanned trainer (f32 table):
    embedding gather (T+1 rows), table-update read-modify-write of the same
    rows, adagrad accumulator traffic, the dataset-row gather, and — for
    sorted/dedup/fused modes — the dedup pipeline's own streams (id sort,
    row permute, blockwise cumsum, boundary gather, grad packing;
    ops/segsum.py). CTR training on a TensorCore-only chip is
    gather/scatter-bound, so HBM utilization — not MFU — is the
    speed-of-light yardstick for this workload."""
    D = model.emb_dim
    row = D * 4.0
    packed = 128.0 * 4.0                    # packed 128-lane rows (w|acc|pad)
    rows = T + 1.0
    is_packed = update_mode in ("fused", "runfused", "fused2")
    gather = rows * (packed if is_packed else row)
    scatter = 2.0 * rows * (packed if is_packed else row)
    if is_packed:
        # skip_ge: only real (unique-id) targets move an RMW pair; junk
        # rows are skipped at the DMA level. real_frac = uniques / rows
        # (workload-dependent; bench.py measures it on a sample batch).
        scatter *= real_frac
    # gather + rmw of [V] accumulator (in-row for all packed modes)
    acc = 0.0 if is_packed else rows * 4.0 * 3.0
    dataset = (model.u_profile_dim + model.ctx_dim + 2) * 4.0 + T * 4.0
    pipeline = 0.0
    if update_mode == "sorted":
        # permute ids (4B×2) + rows (D×4×2)
        pipeline = rows * (8.0 + 2.0 * row)
    elif update_mode == "runfused":
        # id sort (2×4B) + row permute (2×row) + the kernel's [n, D]
        # g-block stream (row) — run summing happens in VMEM
        pipeline = rows * (8.0 + 3.0 * row)
    elif update_mode == "fused2":
        # id sort (2×4B) + row permute (2×row) + blockwise cumsum
        # (2×row) + the kernel's [n, D] cumsum-block stream (row)
        pipeline = rows * (8.0 + 5.0 * row)
    elif update_mode == "fused" and compact_frac:
        # compacted front-end (compact_cap): id sort (2×4B) + rank sort
        # (2×4B) + row permute (2×row) + cumsum (2×row); only the
        # compact_frac selected slots move the c_sel gather (2×row) and
        # the grad pack + kernel stream (2×packed)
        pipeline = (rows * (16.0 + 4.0 * row)
                    + compact_frac * rows * (2.0 * row + 2.0 * packed))
    elif update_mode in ("dedup", "fused"):
        # ops/segsum.py per update row: id sort (2×4B), row permute
        # (2×row), in-block cumsum (2×row), exclusive/boundary gather
        # (2×row), masked rows out (row); fused adds pack_grads ([n, 128]
        # write + kernel read = 2×packed)
        pipeline = rows * (8.0 + 7.0 * row)
        if update_mode == "fused":
            pipeline += rows * 2.0 * packed
    return gather + scatter + acc + dataset + pipeline


def model_flops_per_example(model: SparseCTR, T: int) -> float:
    """Analytic training FLOPs per example (fwd + bwd ≈ 3× fwd for matmuls).

    Counts the dense tower matmuls (the MXU work) plus the attention pool's
    vector ops; embedding gather/scatter moves bytes, not FLOPs, and is
    excluded — this is the standard MFU numerator.
    """
    D = model.emb_dim
    dims = (model.concat_dim,) + tuple(model.hidden) + (1,)
    macs = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    mlp_train = 6.0 * macs                       # 2 FLOPs/MAC × 3 (fwd+bwd)
    attn = 3.0 * (4.0 * T * D)                   # cos-sim + gate + pool
    return mlp_train + attn
