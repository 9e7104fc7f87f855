"""Streaming trainer for datasets larger than device HBM.

The core trainer keeps the whole dataset device-resident (models/trainer.py)
— ideal up to a few GB. MovieLens-20M-scale samples (14M × 281 f32 ≈ 16GB)
exceed a single v5e's HBM, so this variant streams fixed-size row chunks
host→device, double-buffered: while the jitted chunk-scan trains on chunk i,
chunk i+1's `jax.device_put` is already in flight (async dispatch). This is
the TPU realization of the reference's channel-fed assembly fan-out
(SURVEY.md P1, rcmd.go:375-397) at the training stage.

Chunks are shuffled at two levels per epoch: chunk order, and row
permutation within each chunk — the standard approximation of global
shuffling for out-of-core training.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.models.base import RankModel, TrainSample
from goctr_tpu.models.trainer import (
    TrainedRanker, TrainerConfig, _blocks_of, _make_predict_fn,
)
from goctr_tpu.optim.optimizers import make_solver
from goctr_tpu.optim.schedules import make_schedule

log = logging.getLogger(__name__)


def train_ranker_streaming(model: RankModel, sample: TrainSample,
                           cfg: Optional[TrainerConfig] = None,
                           chunk_rows: int = 1 << 20) -> TrainedRanker:
    """Same contract as train_ranker; `chunk_rows` bounds device residency
    (chunk_rows × width × 4B ≈ device footprint per buffer, ×2 in flight)."""
    cfg = cfg or TrainerConfig()
    n, width = sample.x.shape
    bs = min(cfg.batch_size, n)
    # chunk_rows aligned to batch size so every chunk scans fully
    chunk_rows = max(bs, (chunk_rows // bs) * bs)
    n_chunks = -(-n // chunk_rows)

    schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t)
    solver = make_solver(
        cfg.solver, schedule, l2=cfg.l2, weight_decay=cfg.weight_decay,
        momentum=cfg.momentum, beta1=cfg.beta1, beta2=cfg.beta2,
        epsilon=cfg.epsilon)
    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    params = model.init_params(init_key)
    opt_state = solver.init(params)
    info, behavior_len = sample.info, model.behavior_len

    def loss_fn(params, xb, yb, wb, dkey):
        blocks = _blocks_of(xb, info, behavior_len)
        logits = model.apply(params, blocks, train=True, key=dkey)
        losses = (jnp.maximum(logits, 0) - logits * yb +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.sum(losses * wb) / jnp.maximum(jnp.sum(wb), 1.0)

    n_batches_per_chunk = chunk_rows // bs

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def chunk_step(params, opt_state, x, y, w, chunk_key):
        perm_key, drop_key = jax.random.split(chunk_key)
        if cfg.shuffle:
            perm = jax.random.permutation(perm_key, chunk_rows)
        else:
            perm = jnp.arange(chunk_rows)
        perm = perm.reshape(n_batches_per_chunk, bs)

        def body(carry, batch):
            params, opt_state = carry
            idx, b = batch
            dkey = jax.random.fold_in(drop_key, b)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, jnp.take(x, idx, axis=0), jnp.take(y, idx),
                jnp.take(w, idx), dkey)
            updates, opt_state = solver.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (perm, jnp.arange(n_batches_per_chunk)))
        return params, opt_state, jnp.mean(losses)

    def put_chunk(ci: int):
        """Pad chunk to chunk_rows; returns device buffers (async)."""
        s, e = ci * chunk_rows, min((ci + 1) * chunk_rows, n)
        rows = e - s
        x_np = np.zeros((chunk_rows, width), np.float32)
        x_np[:rows] = sample.x[s:e]
        y_np = np.zeros((chunk_rows,), np.float32)
        y_np[:rows] = np.asarray(sample.y[s:e]).ravel()
        w_np = np.zeros((chunk_rows,), np.float32)
        w_np[:rows] = 1.0
        return (jax.device_put(x_np), jax.device_put(y_np),
                jax.device_put(w_np))

    rng = np.random.default_rng(cfg.seed)
    best = float("inf")
    no_improve = 0
    loss_curve: list[float] = []
    epoch_times: list[float] = []
    for epoch in range(cfg.epochs):
        te = time.perf_counter()
        order = rng.permutation(n_chunks) if cfg.shuffle else \
            np.arange(n_chunks)
        pending = put_chunk(order[0])
        chunk_losses = []
        for i, ci in enumerate(order):
            bufs = pending
            if i + 1 < len(order):
                pending = put_chunk(order[i + 1])   # overlap H2D with compute
            key, ck = jax.random.split(key)
            params, opt_state, loss = chunk_step(params, opt_state, *bufs, ck)
            chunk_losses.append(loss)
        cost = float(np.mean([float(l) for l in chunk_losses]))
        epoch_times.append(time.perf_counter() - te)
        loss_curve.append(cost)
        if cost < best - cfg.tol:
            best, no_improve = cost, 0
        else:
            no_improve += 1
        if cfg.verbose:
            log.info("epoch %d | cost %.6f | %.2fs", epoch, cost,
                     epoch_times[-1])
        if cfg.early_stop and no_improve >= cfg.early_stop:
            break

    return TrainedRanker(
        model=model, params=params, info=info, behavior_len=behavior_len,
        loss_curve=loss_curve, epoch_times=epoch_times, opt_state=opt_state,
        _predict_fn=_make_predict_fn(model, info, behavior_len))
