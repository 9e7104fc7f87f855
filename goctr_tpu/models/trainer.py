"""Generic ranker training/prediction engine — the TPU replacement for the
reference's tape-VM loop (model/model.go:27-213 Train, :242-352 Predict).

Where the reference re-slices five host tensors, re-binds graph inputs and
re-runs a tape VM per batch (model.go:111-197), here the whole dataset is
device-resident and one jitted `epoch_step` lax.scan's over every batch:
gather rows → forward → BCE-with-logits → grad → solver update. The graph
compiles once per (batch_size, width) and the epoch runs without host
round-trips; padded tail rows are masked out of the loss (the reference
zero-pads and trains on them, model.go:357-371 — a small bias we don't copy).

Early stopping matches the reference: epoch train cost plateau with a
patience counter (model.go:198-209).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.models.base import RankModel, SampleInfo, TrainSample, split_blocks
from goctr_tpu.ops.losses import bce_with_logits
from goctr_tpu.optim.optimizers import make_solver
from goctr_tpu.optim.schedules import make_schedule

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    batch_size: int = 200          # reference dinimpl_test.go:38
    epochs: int = 200
    early_stop: int = 20           # 0 disables (model.go:205)
    solver: str = "adam"
    lr: float = 1e-3
    lr_schedule: str = "constant"
    power_t: float = 0.5
    l2: float = 1e-4               # gorgonia WithL2Reg (model.go:88)
    weight_decay: float = 0.0
    momentum: float = 0.9
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    shuffle: bool = True
    seed: int = 0
    tol: float = 0.0               # min improvement to reset patience
    verbose: bool = False
    checkpoint_every: int = 0      # epochs between auto-checkpoints (0=off)
    checkpoint_dir: str = ""       # where periodic checkpoints land
    # device-resident dataset storage dtype. "float16" halves the HBM the
    # whole-dataset-on-device trainer pins (the ML-20M protocol's 14.4M ×
    # 281-col matrix is 16.2 GB in f32 — larger than a v5e) and is lossless
    # for these features' dynamic range; batches are upcast on gather.
    store_dtype: str = "float32"   # float32 | float16 | bfloat16


@dataclasses.dataclass
class TrainedRanker:
    model: RankModel
    params: dict
    info: SampleInfo
    behavior_len: int
    loss_curve: list[float]
    epoch_times: list[float] = dataclasses.field(default_factory=list)
    opt_state: object = dataclasses.field(default=None, repr=False)
    _predict_fn: Callable = dataclasses.field(default=None, repr=False)

    def predict(self, x: np.ndarray, batch_size: int = 8192) -> np.ndarray:
        """Scores [N] in [0,1]. Pads to the bucket batch size so the apply
        graph compiles once (reference zero-pad semantics, model.go:357-371)."""
        n = x.shape[0]
        if n == 0:
            return np.zeros(0, np.float32)
        fn = self._predict_fn or _make_predict_fn(
            self.model, self.info, self.behavior_len)
        out = np.empty(n, dtype=np.float32)
        bs = min(batch_size, _bucket(n, cap=batch_size))
        for start in range(0, n, bs):
            chunk = x[start:start + bs]
            if chunk.shape[0] < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - chunk.shape[0], x.shape[1]),
                                     x.dtype)])
            scores = fn(self.params, jnp.asarray(chunk))
            out[start:start + bs] = np.asarray(scores)[:min(bs, n - start)]
        return out

    def predict_logits(self, x: np.ndarray) -> np.ndarray:
        probs = np.clip(self.predict(x), 1e-7, 1 - 1e-7)
        return np.log(probs / (1 - probs))

    def predict_all(self, x: np.ndarray, batch_size: int = 65536,
                    store_dtype: str = "float16") -> np.ndarray:
        """Whole-matrix scoring in ONE device dispatch: x uploads once
        (store_dtype, both axes padded so the layout copy is elided — see
        train_ranker) and a lax.scan walks the buckets on device. Per-call
        h2d through a remote relay made `predict` 572 round-trips at the
        ML-20M eval (4.68M rows); this is the eval-scale path."""
        n, width = x.shape
        if n == 0:
            return np.zeros(0, np.float32)
        bs = min(batch_size, n)
        n_b = -(-n // bs)
        sdt = np.dtype(store_dtype) if store_dtype != "bfloat16" \
            else jnp.bfloat16
        wp = -(-width // 128) * 128
        # allocate directly in the storage dtype: NumPy casts on assignment,
        # so the host never holds an f32 copy of the padded matrix (~7 GB
        # transient at the ML-20M eval shape)
        xp = np.zeros((n_b * bs, wp), sdt)
        xp[:n, :width] = x
        xd = jnp.asarray(xp)
        del xp
        info, behavior_len, model = self.info, self.behavior_len, self.model

        @partial(jax.jit, static_argnames=())
        def run(params, xd):
            def body(_, b):
                xb = jax.lax.dynamic_slice(
                    xd, (b * bs, 0), (bs, xd.shape[1]))[:, :width] \
                    .astype(jnp.float32)
                blocks = _blocks_of(xb, info, behavior_len)
                return None, jax.nn.sigmoid(
                    model.apply(params, blocks, train=False))
            _, scores = jax.lax.scan(body, None, jnp.arange(n_b))
            return scores.reshape(-1)

        return np.asarray(run(self.params, xd))[:n]


def _bucket(n: int, cap: int = 8192) -> int:
    """Smallest power-of-two ≥ n, capped — keeps jit cache small. Callers
    that want bigger device batches raise `cap` via predict(batch_size=...)
    (fewer per-call h2d round-trips — each costs seconds on a remote
    relay)."""
    b = 128
    while b < n and b < cap:
        b *= 2
    return b


def _blocks_of(x, info: SampleInfo, behavior_len: int):
    # behavior_len == 0 → whole-row models (MLPTower); no 4-block split
    if behavior_len == 0:
        return (x,)
    return split_blocks(x, info, behavior_len)


def _make_predict_fn(model: RankModel, info: SampleInfo, behavior_len: int):
    @jax.jit
    def fn(params, x):
        blocks = _blocks_of(x, info, behavior_len)
        return jax.nn.sigmoid(model.apply(params, blocks, train=False))
    return fn


def train_ranker(model: RankModel, sample: TrainSample,
                 cfg: Optional[TrainerConfig] = None,
                 resume_from: Optional[TrainedRanker] = None
                 ) -> TrainedRanker:
    """Train (or resume: pass a prior TrainedRanker carrying params +
    optimizer state — true mid-training resume, which the reference's
    weights-only JSON snapshots cannot do, SURVEY.md §5)."""
    cfg = cfg or TrainerConfig()
    n, width = sample.x.shape
    bs = min(cfg.batch_size, n)
    n_batches = -(-n // bs)
    n_pad = n_batches * bs

    sdt = np.dtype(cfg.store_dtype) if cfg.store_dtype != "bfloat16" \
        else jnp.bfloat16
    xh = np.ascontiguousarray(sample.x, dtype=np.float32).astype(
        sdt, copy=False)
    yh = np.ascontiguousarray(sample.y, dtype=np.float32).ravel()
    # Pad BOTH axes on host, to the batch multiple (tail rows carry weight
    # 0) and the feature width to a 128-lane multiple. The lane pad is not
    # extra memory — TPU tiling pads the minor dim to 128 lanes anyway —
    # but it makes the uploaded layout coincide with the compiled
    # program's tiled layout, eliding the layout-conversion copy that
    # otherwise holds TWO dataset-sized buffers at first use (measured
    # OOM at the ML-20M protocol: 7.5 GB compact + 10.3 GB tiled of the
    # same f16[14.4M, 281]). A device-side concatenate is equally fatal.
    width_pad = -(-width // 128) * 128
    if n_pad > n or width_pad > width:
        padded = np.zeros((n_pad, width_pad), xh.dtype)
        padded[:n, :width] = xh
        xh = padded
    if n_pad > n:
        yh = np.concatenate([yh, np.zeros((n_pad - n,), np.float32)])
    x = jnp.asarray(xh)
    y = jnp.asarray(yh)
    del xh, yh
    w = jnp.concatenate([jnp.ones((n,), jnp.float32),
                         jnp.zeros((n_pad - n,), jnp.float32)])

    schedule = make_schedule(cfg.lr_schedule, cfg.lr, cfg.power_t)
    solver = make_solver(
        cfg.solver, schedule, l2=cfg.l2, weight_decay=cfg.weight_decay,
        momentum=cfg.momentum, beta1=cfg.beta1, beta2=cfg.beta2,
        epsilon=cfg.epsilon)

    key = jax.random.key(cfg.seed)
    key, init_key = jax.random.split(key)
    if resume_from is not None:
        params = resume_from.params
        opt_state = resume_from.opt_state or solver.init(params)
        key = jax.random.fold_in(key, len(resume_from.loss_curve))
    else:
        params = model.init_params(init_key)
        opt_state = solver.init(params)

    info, behavior_len = sample.info, model.behavior_len

    def loss_fn(params, xb, yb, wb, dkey):
        blocks = _blocks_of(xb, info, behavior_len)
        logits = model.apply(params, blocks, train=True, key=dkey)
        losses = (jnp.maximum(logits, 0) - logits * yb +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.sum(losses * wb) / jnp.maximum(jnp.sum(wb), 1.0)

    # x/y/w are explicit jit arguments — closing over them would embed the
    # whole dataset as an HLO constant (minutes-long compiles at 100k+ rows)
    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_step(params, opt_state, x, y, w, epoch_key):
        perm_key, drop_key = jax.random.split(epoch_key)
        if cfg.shuffle:
            perm = jax.random.permutation(perm_key, n_pad)
        else:
            perm = jnp.arange(n_pad)
        perm = perm.reshape(n_batches, bs)

        def body(carry, batch):
            params, opt_state = carry
            idx, b = batch
            xb = jnp.take(x, idx, axis=0)[:, :width].astype(jnp.float32)
            yb = jnp.take(y, idx)
            wb = jnp.take(w, idx)
            dkey = jax.random.fold_in(drop_key, b)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb, wb, dkey)
            updates, opt_state = solver.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (perm, jnp.arange(n_batches)))
        return params, opt_state, jnp.mean(losses)

    best_cost = float("inf")
    no_improve = 0
    loss_curve: list[float] = []
    epoch_times: list[float] = []
    t0 = time.perf_counter()
    for epoch in range(cfg.epochs):
        te = time.perf_counter()
        key, ekey = jax.random.split(key)
        params, opt_state, cost = epoch_step(params, opt_state, x, y, w, ekey)
        cost = float(cost)   # blocks on device; epoch time is accurate
        epoch_times.append(time.perf_counter() - te)
        loss_curve.append(cost)
        if cost < best_cost - cfg.tol:
            best_cost = cost
            no_improve = 0
        else:
            no_improve += 1
        if cfg.verbose:
            log.info("epoch %d | no_improve %d | cost %.6f", epoch,
                     no_improve, cost)
        if (cfg.checkpoint_every and cfg.checkpoint_dir
                and (epoch + 1) % cfg.checkpoint_every == 0):
            # periodic failure-recovery snapshot (params + opt state);
            # restore with load_checkpoint + resume_from (SURVEY.md §5:
            # the reference has no recovery story at all)
            from goctr_tpu.models.io import save_checkpoint
            snap = TrainedRanker(
                model=model, params=params, info=info,
                behavior_len=behavior_len, loss_curve=list(loss_curve),
                opt_state=opt_state)
            save_checkpoint(cfg.checkpoint_dir, snap, trainer_config=cfg)
        if cfg.early_stop and no_improve >= cfg.early_stop:
            if cfg.verbose:
                log.info("early stop at epoch %d", epoch)
            break
    if cfg.verbose:
        log.info("trained %d epochs in %.2fs (%.0f examples/s)",
                 len(loss_curve), time.perf_counter() - t0,
                 len(loss_curve) * n / max(time.perf_counter() - t0, 1e-9))

    if resume_from is not None:
        loss_curve = resume_from.loss_curve + loss_curve
    return TrainedRanker(
        model=model, params=params, info=info, behavior_len=behavior_len,
        loss_curve=loss_curve, epoch_times=epoch_times, opt_state=opt_state,
        _predict_fn=_make_predict_fn(model, info, behavior_len))
