"""End-to-end training of SparseCTR: raw-id batches → sharded-table
gradients, no pre-trained embedding stage.

This is the workload the reference architecture cannot express (its item
embeddings are a frozen pre-trained Go map, rcmd.go:501-531): the [V, D]
item table lives row-sharded across the `model` mesh axis and learns jointly
with the dense tower. Per epoch, host-shuffled minibatches are device_put
with their NamedShardings and run through the jitted sharded step — the
input pipeline's host→device copies overlap compute via async dispatch.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from goctr_tpu.optim.optimizers import make_solver
from goctr_tpu.optim.schedules import make_schedule
from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.parallel.sparse_ctr import SparseBatch, SparseCTR
from goctr_tpu.parallel.train import (
    batch_shardings, make_sharded_predict, make_sharded_train_step,
    param_shardings,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class SparseSample:
    """Raw-feature training set (the id-native analogue of TrainSample)."""
    user_profile: np.ndarray   # [N, U] float32
    behavior_ids: np.ndarray   # [N, T] int32, -1 padded
    item_ids: np.ndarray       # [N] int32
    ctx: np.ndarray            # [N, C] float32
    labels: np.ndarray         # [N] float32

    @property
    def rows(self) -> int:
        return self.item_ids.shape[0]


@dataclasses.dataclass
class TrainedSparseRanker:
    model: SparseCTR
    params: dict
    mesh: Mesh
    loss_curve: list[float]
    epoch_times: list[float]
    opt_state: object = dataclasses.field(default=None, repr=False)
    # sparse-update path only: [V_pad] row-sharded adagrad accumulator and
    # the max per-step count of unique ids dropped by the dedup'd lookup
    # exchange (0 = every batch fit lookup_dedup_cap; nonzero = grow the cap)
    acc: object = dataclasses.field(default=None, repr=False)
    lookup_overflow_max: int = 0
    # >1: params["item_table"] is grouped packed lines [V_pad/G, 128]
    # row-sharded over `model` (very large small-D vocabs stay in line
    # layout end-to-end — mirror of TrainedScanned.packed_group)
    packed_group: int = 1
    # True: params["item_table"] is the one-row-per-line [V_pad, 128]
    # (w | acc | pad) fused layout (mid-training snapshots only; finished
    # rankers export plain [V_pad, D])
    table_packed: bool = False

    def save(self, path, trainer_config=None, table_opt=None) -> None:
        """Host-exported npz+json checkpoint (models/io.py sparse tier):
        plain [vocab, D] table + [vocab] adagrad acc regardless of the
        in-memory layout, dense params, optimizer state, loss curve."""
        from goctr_tpu.models.io import save_sparse_checkpoint
        dense = {k: v for k, v in self.params.items() if k != "item_table"}
        w, a = _host_export_table(
            self.params["item_table"], self.acc, self.model.item_vocab,
            self.model.emb_dim, self.packed_group, self.table_packed)
        save_sparse_checkpoint(path, self.model, dense, w, a,
                               self.loss_curve, opt_state=self.opt_state,
                               trainer_config=trainer_config,
                               table_opt=table_opt)

    def predict(self, sample: SparseSample, batch_size: int = 8192
                ) -> np.ndarray:
        fn = make_sharded_predict(self.model, self.mesh,
                                  table_group=self.packed_group,
                                  table_packed=self.table_packed)
        bsh = batch_shardings(self.mesh)
        n = sample.rows
        d = self.mesh.shape["data"]
        bs = max(d, (min(batch_size, n) // d) * d)
        out = np.empty(n, np.float32)
        for s in range(0, n, bs):
            e = min(s + bs, n)
            pad = bs - (e - s)
            sl = slice(s, e)
            batch = _put_batch(sample, sl, pad, bsh)
            scores = np.asarray(fn(self.params, batch))
            out[s:e] = scores[:e - s]
        return out


def _host_export_table(table, acc, vocab: int, d: int, packed_group: int,
                       table_packed: bool):
    """Any in-memory table layout → plain host ([vocab, D] w, [vocab] acc)."""
    if packed_group > 1:
        from goctr_tpu.ops.pallas.row_optimizer import unpack_table_grouped_np
        return unpack_table_grouped_np(np.asarray(table), vocab, d)
    arr = np.asarray(table)
    if table_packed:
        return arr[:vocab, :d], np.ascontiguousarray(arr[:vocab, d])
    a = (np.asarray(acc)[:vocab] if acc is not None
         else np.zeros(vocab, np.float32))
    return arr[:vocab], a


def _put_batch(sample: SparseSample, sl: slice, pad: int, bsh) -> SparseBatch:
    def p(arr, sharding, fill=0):
        a = arr[sl]
        if pad:
            shape = (pad,) + a.shape[1:]
            a = np.concatenate([a, np.full(shape, fill, a.dtype)])
        return jax.device_put(np.ascontiguousarray(a), sharding)

    return SparseBatch(
        user_profile=p(sample.user_profile, bsh.user_profile),
        behavior_ids=p(sample.behavior_ids, bsh.behavior_ids, fill=-1),
        item_ids=p(sample.item_ids, bsh.item_ids),
        ctx=p(sample.ctx, bsh.ctx),
        labels=p(sample.labels, bsh.labels),
    )


def train_sparse(model: SparseCTR, sample: SparseSample, mesh: Mesh,
                 cfg: Optional[TrainerConfig] = None,
                 table_opt=None,
                 resume_from: Optional[TrainedSparseRanker] = None,
                 checkpoint_every: int = 0,
                 checkpoint_path=None,
                 epoch_hook=None) -> TrainedSparseRanker:
    """Multi-chip training over a (data, model) mesh.

    table_opt (parallel/table_opt.TableOptConfig) switches the embedding
    table to SPARSE row-wise updates (make_sharded_sparse_train_step): the
    table never enters autodiff, so no [V, D] cotangent or dense-optimizer
    moments are ever materialized — required at BASELINE config-#5 vocab
    (100M rows). table_opt=None keeps the dense path (table trained by the
    same optax solver as the tower; fine at small vocab, 3 table-sized
    extra buffers).

    resume_from (VERDICT r4 next-#4): a prior TrainedSparseRanker — from a
    finished run or models/io.load_sparse_checkpoint — restores dense
    params, table, adagrad accumulator, and dense-optimizer state, and
    REPLAYS the shuffle/dropout streams + early-stop state so the resumed
    trajectory is bit-identical to the uninterrupted one (asserted in
    tests/test_sparse_trainer.py). cfg.epochs counts ADDITIONAL epochs.

    checkpoint_every/checkpoint_path: every k epochs write a full
    host-exported checkpoint (plain-layout table regardless of the
    in-memory packed/grouped layout) via models/io.save_sparse_checkpoint.

    epoch_hook: callable(epoch, cost, ranker) run after each epoch with a
    LIVE snapshot ranker (current in-training params, layout-aware
    predict) — the mid-training eval surface.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = cfg or TrainerConfig()
    n = sample.rows
    d = mesh.shape["data"]
    bs = max(d, (min(cfg.batch_size, n) // d) * d)   # divisible by data axis

    schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t)
    solver = make_solver(
        cfg.solver, schedule, l2=cfg.l2, weight_decay=cfg.weight_decay,
        momentum=cfg.momentum, beta1=cfg.beta1, beta2=cfg.beta2,
        epsilon=cfg.epsilon)
    sparse = table_opt is not None
    packed = sparse and table_opt.update_mode in ("fused", "runfused",
                                                  "fused2")
    # grouped 128-lane lines: `fused` at small D (G = 128//(D+1) > 1)
    # stores/updates the local tables in line layout — BASELINE #5's
    # multi-chip fast path (3.7 GB/device at 100M × 16 on m=2, vs 25.6 GB
    # packed one-row-per-line)
    G = 1
    if packed and table_opt.update_mode == "fused":
        from goctr_tpu.ops.pallas.row_optimizer import group_size
        G = group_size(model.emb_dim)
    # very large grouped vocabs: init the line layout directly (no [V, D]
    # intermediate) and keep it end-to-end — mirror of the scanned
    # trainer's grouped-resident mode
    from goctr_tpu.parallel.scanned import GROUPED_RESIDENT_MIN_V
    resident = G > 1 and model.item_vocab >= GROUPED_RESIDENT_MIN_V
    done_epochs = len(resume_from.loss_curve) if resume_from is not None \
        else 0
    if resume_from is not None:
        params = {k: v for k, v in resume_from.params.items()
                  if k != "item_table"}
        params["item_table"] = resume_from.params["item_table"]
        resume_acc = resume_from.acc
        resumed_lines = resume_from.packed_group
    else:
        params = model.init_params(jax.random.key(cfg.seed), mesh,
                                   table_group=G if resident else 1)
        resume_acc, resumed_lines = None, 0
    psh = param_shardings(params, mesh)
    params = jax.device_put(params, psh)
    acc = None
    if sparse:
        from goctr_tpu.parallel.train import make_sharded_sparse_train_step
        dense = {k: v for k, v in params.items() if k != "item_table"}
        opt_state = (resume_from.opt_state
                     if resume_from is not None
                     and resume_from.opt_state is not None
                     else solver.init(dense))
        if packed and model.emb_dim >= 128:
            raise ValueError("packed update modes require emb_dim < 128")
        if resume_from is not None and resumed_lines > 1 and not (
                packed and G == resumed_lines):
            raise ValueError(
                "resume_from holds grouped lines but the target layout "
                "differs — export it (ranker.save + load) first")
        # lines already in place: grouped-resident fresh init, or an
        # in-memory resume of a grouped-resident ranker
        already_lines = resumed_lines > 1 or (resume_from is None
                                              and resident)
        if packed and G > 1 and not already_lines:
            # pack the plain [V?, D] table (+ acc when resuming) into
            # grouped lines, padded to a m·G row multiple. Fresh
            # small-vocab runs pack the STANDARD init draw (identical
            # weights to the dedup baseline — parity tests depend on it).
            from goctr_tpu.ops.pallas.row_optimizer import pack_table_grouped
            m_sh = mesh.shape["model"]
            w = params["item_table"]
            a = (resume_acc if resume_acc is not None
                 else jnp.zeros((w.shape[0],), jnp.float32))
            a = jnp.asarray(a, jnp.float32)
            v_pad = -(-w.shape[0] // (m_sh * G)) * (m_sh * G)
            if v_pad > w.shape[0]:
                w = jnp.concatenate(
                    [w, jnp.zeros((v_pad - w.shape[0], model.emb_dim),
                                  jnp.float32)])
                a = jnp.concatenate(
                    [a, jnp.zeros((v_pad - a.shape[0],), jnp.float32)])
            params["item_table"] = jax.jit(
                pack_table_grouped,
                out_shardings=NamedSharding(mesh, P("model", None)))(w, a)
        elif packed and G == 1:
            # packed [V_pad, 128] (w | acc | pad) local-table layout: the
            # forward gather lane-slices (sharded_lookup width=D) and the
            # Pallas RMW kernel updates weights + adagrad acc in one pass
            from goctr_tpu.ops.pallas.row_optimizer import pack_table
            params["item_table"] = jax.device_put(
                pack_table(params["item_table"], resume_acc),
                NamedSharding(mesh, P("model", None)))
        acc = jax.device_put(
            (jnp.asarray(resume_acc, jnp.float32)
             if not packed and resume_acc is not None
             else jnp.zeros((params["item_table"].shape[0],), jnp.float32)),
            NamedSharding(mesh, P("model")))
        step = make_sharded_sparse_train_step(model, solver, mesh, table_opt)
    else:
        opt_state = (resume_from.opt_state
                     if resume_from is not None
                     and resume_from.opt_state is not None
                     else solver.init(params))
        step = make_sharded_train_step(model, solver, mesh)
    opt_state = jax.device_put(opt_state, param_shardings(opt_state, mesh))
    bsh = batch_shardings(mesh)

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.key(cfg.seed + 1)
    best, no_improve = float("inf"), 0
    loss_curve: list[float] = []
    epoch_times: list[float] = []
    overflow_max = 0
    n_batches = -(-n // bs)
    if done_epochs:
        # replay the consumed host-shuffle and PRNG-key streams plus the
        # early-stop state so the resumed run continues the EXACT
        # uninterrupted trajectory (bit-parity asserted in tests)
        for _ in range(done_epochs):
            if cfg.shuffle:
                rng.permutation(n)
        for _ in range(done_epochs * n_batches):
            key, _ = jax.random.split(key)
        for cost in resume_from.loss_curve:
            if cost < best - cfg.tol:
                best, no_improve = cost, 0
            else:
                no_improve += 1

    def _live_ranker() -> TrainedSparseRanker:
        return TrainedSparseRanker(
            model=model, params=params, mesh=mesh,
            loss_curve=(resume_from.loss_curve if resume_from is not None
                        else []) + loss_curve,
            epoch_times=epoch_times, opt_state=opt_state, acc=acc,
            lookup_overflow_max=overflow_max,
            packed_group=G if (packed and G > 1) else 1,
            table_packed=packed and G == 1)

    for epoch in range(cfg.epochs):
        te = time.perf_counter()
        order = rng.permutation(n) if cfg.shuffle else np.arange(n)
        tot = 0.0
        for b in range(n_batches):
            idx = order[b * bs:(b + 1) * bs]
            pad = bs - idx.size
            sub = SparseSample(
                user_profile=sample.user_profile[idx],
                behavior_ids=sample.behavior_ids[idx],
                item_ids=sample.item_ids[idx],
                ctx=sample.ctx[idx], labels=sample.labels[idx])
            batch = _put_batch(sub, slice(None), pad, bsh)
            key, k = jax.random.split(key)
            if sparse:
                params, opt_state, acc, loss, over = step(
                    params, opt_state, acc, batch, k)
                over = int(over)
                if over > overflow_max:
                    overflow_max = over
                    log.warning(
                        "lookup dedup_cap overflow: %d unique ids dropped "
                        "this step — results are inexact, raise "
                        "lookup_dedup_cap (currently %d)", over,
                        model.lookup_dedup_cap)
            else:
                params, opt_state, loss = step(params, opt_state, batch, k)
            tot += float(loss) * idx.size
        cost = tot / n
        loss_curve.append(cost)
        epoch_times.append(time.perf_counter() - te)
        if cost < best - cfg.tol:
            best, no_improve = cost, 0
        else:
            no_improve += 1
        if cfg.verbose:
            log.info("epoch %d | cost %.6f | %.2fs", epoch, cost,
                     epoch_times[-1])
        if epoch_hook is not None:
            epoch_hook(done_epochs + epoch, cost, _live_ranker())
        if (checkpoint_every and checkpoint_path
                and (epoch + 1) % checkpoint_every == 0):
            _live_ranker().save(checkpoint_path, trainer_config=cfg,
                                table_opt=table_opt)
        if cfg.early_stop and no_improve >= cfg.early_stop:
            break

    packed_group = 1
    if packed and G > 1:
        if resident:
            packed_group = G      # stays in line layout end-to-end
        else:
            # export standard layout via a per-shard unpack (each model
            # shard's Lm·G rows unpack locally; no cross-shard traffic)
            from functools import partial as _partial
            from goctr_tpu.ops.pallas.row_optimizer import (
                unpack_table_grouped)

            @_partial(jax.shard_map, mesh=mesh,
                      in_specs=(P("model", None),),
                      out_specs=(P("model", None), P("model")),
                      check_vma=False)
            def _unpack(lines):
                return unpack_table_grouped(lines, lines.shape[0] * G,
                                            model.emb_dim)

            w, acc_lane = _unpack(params["item_table"])
            params = dict(params, item_table=w)
            acc = acc_lane
    elif packed:
        # export the standard layout: [V_pad, D] table + [V_pad] adagrad
        # accumulator (predict and checkpoints see no packing)
        from goctr_tpu.ops.pallas.row_optimizer import unpack_table
        w, acc_lane = unpack_table(params["item_table"], model.emb_dim)
        params = dict(params, item_table=jax.device_put(
            w, NamedSharding(mesh, P("model", None))))
        acc = jax.device_put(acc_lane, NamedSharding(mesh, P("model")))
    full_curve = (resume_from.loss_curve if resume_from is not None
                  else []) + loss_curve
    return TrainedSparseRanker(model=model, params=params, mesh=mesh,
                               loss_curve=full_curve,
                               epoch_times=epoch_times, opt_state=opt_state,
                               acc=acc, lookup_overflow_max=overflow_max,
                               packed_group=packed_group)
