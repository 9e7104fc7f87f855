"""Device-resident candidate scoring — the TPU-first serving path.

The reference's BatchPredict (rcmd.go:277-337) — and this repo's parity
path (recommend/rcmd.py BatchPredict) — assembles a [K, W] float feature
matrix on the HOST per request and ships it to the model: ~73 KB/example
at the headline config, which through a remote-relay h2d (~16 MB/s,
CLAUDE.md) caps serving at ~10k scores/s while the same chip trains at
343k examples/s (VERDICT r4 weak #4).

This module keeps the big state device-resident — the item embedding
table (any layout: plain [V, D], fused-packed [V, 128], or grouped
[L, 128] lines) and the dense tower — and ships per request only what the
request actually contains:

    (user profile [U] f32, behavior ids [T] i32, ctx [C] f32,
     candidate ids [K] i32)  ≈ 2 KB per 400-candidate request,

then gathers candidate/behavior rows and runs the DIN tower on device.
Two amortization levers make it fast through a ~30 ms/dispatch relay:

  * padded-bucket jitted scorers (no shape churn → no recompiles), and
  * request micro-batching: `score_batch` scores R requests × K
    candidates in ONE dispatch, and `MicroBatcher` (serve/api.py wiring)
    coalesces concurrent HTTP requests into that shape — continuous
    batching, the standard production serving pattern.

Reference parity anchor: request/response semantics match api.go:106-131;
the scoring math is SparseCTR.apply_pooled (din.go:231-298 semantics).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, ladder: tuple[int, ...]) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


@dataclasses.dataclass
class DeviceScorer:
    """Jitted, bucket-padded, layout-aware scorer over a resident table.

    Build via `from_scanned` (single-chip TrainedScanned, any table
    layout) or directly from (model, dense_params, table).
    """
    model: object                       # SparseCTR
    dense_params: dict
    table: jax.Array                    # resident; layout per fields below
    packed_group: int = 1               # >1: grouped [L, 128] lines
    table_packed: bool = False          # True: [V, 128] (w | acc | pad)
    cand_buckets: tuple[int, ...] = (128, 512, 2048)
    req_buckets: tuple[int, ...] = (1, 8, 32)

    @classmethod
    def from_scanned(cls, ranker, **kw) -> "DeviceScorer":
        """From parallel/scanned.TrainedScanned (plain or grouped-resident
        table). The table array is shared, not copied."""
        return cls(model=ranker.model, dense_params=ranker.dense_params,
                   table=ranker.table,
                   packed_group=getattr(ranker, "packed_group", 1), **kw)

    def __post_init__(self):
        self._fwd = self._build()

    def _build(self):
        model = self.model
        G = self.packed_group
        D = model.emb_dim
        cd = model.compute_dtype
        packed = self.table_packed

        @jax.jit
        def fwd(dense, table, prof, bids, ctx, iids):
            # prof [R, U], bids [R, T] (-1 pad), ctx [R, C],
            # iids [R, K] (-1 pad) → scores [R, K]
            R, K = iids.shape
            T = bids.shape[1]

            def rows_of(ids):
                if G > 1:
                    lines = jnp.take(table, ids // G, axis=0)
                    l3 = lines[..., :G * (D + 1)].reshape(
                        ids.shape + (G, D + 1))
                    oh = jax.nn.one_hot(ids % G, G, dtype=jnp.float32)
                    return jnp.einsum("...g,...gd->...d", oh,
                                      l3)[..., :D].astype(cd)
                rows = jnp.take(table, ids, axis=0)
                if packed:
                    rows = rows[..., :D]
                return rows.astype(cd)

            emb_b = rows_of(jnp.maximum(bids, 0))          # [R, T, D]
            emb_i = rows_of(jnp.maximum(iids, 0))          # [R, K, D]
            mask = (bids >= 0).astype(jnp.float32)         # [R, T]
            # per-candidate DIN attention: flatten (request, candidate)
            # into the batch dim; XLA fuses the behavior broadcast
            eb = jnp.broadcast_to(emb_b[:, None], (R, K, T, D)) \
                .reshape(R * K, T, D)
            mk = jnp.broadcast_to(mask[:, None], (R, K, T)) \
                .reshape(R * K, T)
            pr = jnp.broadcast_to(prof[:, None], (R, K, prof.shape[1])) \
                .reshape(R * K, -1)
            cx = jnp.broadcast_to(ctx[:, None], (R, K, ctx.shape[1])) \
                .reshape(R * K, -1)
            logits = model.apply_pooled(
                dense, pr, eb, emb_i.reshape(R * K, D), cx, mk,
                train=False)
            scores = jax.nn.sigmoid(logits).reshape(R, K)
            return jnp.where(iids >= 0, scores, 0.0)

        return fwd

    # ------------------------------------------------------------ scoring --
    def score_batch(self, profiles: np.ndarray, behavior_ids: np.ndarray,
                    ctx: np.ndarray, cand_ids: list[np.ndarray]
                    ) -> list[np.ndarray]:
        """R requests in ONE dispatch. profiles [R, U], behavior_ids
        [R, T] (-1 padded), ctx [R, C]; cand_ids = R int arrays (ragged).
        Returns R score arrays aligned with each request's candidates."""
        R = len(cand_ids)
        k_max = max((len(c) for c in cand_ids), default=1)
        K = _bucket(k_max, self.cand_buckets)
        Rp = _bucket(R, self.req_buckets)
        iids = np.full((Rp, K), -1, np.int32)
        for r, c in enumerate(cand_ids):
            iids[r, :len(c)] = np.asarray(c, np.int32)[:K]

        def padr(a, fill=0.0):
            a = np.asarray(a)
            if a.shape[0] < Rp:
                a = np.concatenate(
                    [a, np.full((Rp - a.shape[0],) + a.shape[1:], fill,
                                a.dtype)])
            return a

        out = self._fwd(self.dense_params, self.table,
                        padr(profiles.astype(np.float32)),
                        padr(behavior_ids.astype(np.int32), -1),
                        padr(ctx.astype(np.float32)),
                        jnp.asarray(iids))
        out = np.asarray(out)
        return [out[r, :len(c)] for r, c in enumerate(cand_ids)]

    def score(self, profile: np.ndarray, behavior_ids: np.ndarray,
              ctx: np.ndarray, cand_ids: np.ndarray) -> np.ndarray:
        return self.score_batch(profile[None], behavior_ids[None],
                                ctx[None], [cand_ids])[0]


class MicroBatcher:
    """Coalesce concurrent rank requests into one device dispatch.

    Each server thread calls submit(); the first waiter becomes the
    flusher: it sleeps up to max_wait_s (letting peers queue up), then
    scores everything queued in one score_batch call and distributes the
    results. Under a single-threaded client this degrades to per-request
    dispatch with max_wait_s added — keep max_wait_s ≈ a few ms, well
    under the ~30 ms relay dispatch overhead it amortizes."""

    def __init__(self, scorer: DeviceScorer, max_requests: int = 32,
                 max_wait_s: float = 0.004):
        import threading
        self.scorer = scorer
        self.max_requests = max_requests
        self.max_wait_s = max_wait_s
        self._lock = threading.Lock()
        self._queue: list[dict] = []
        self._threading = threading

    def submit(self, profile, behavior_ids, ctx, cand_ids) -> np.ndarray:
        ev = self._threading.Event()
        item = {"profile": profile, "bids": behavior_ids, "ctx": ctx,
                "cands": np.asarray(cand_ids, np.int32), "ev": ev,
                "out": None}
        with self._lock:
            self._queue.append(item)
            flusher = len(self._queue) == 1
        if flusher:
            ev.wait(self.max_wait_s)        # let concurrent peers queue
            with self._lock:
                batch, self._queue = self._queue, []
            if batch:
                self._flush(batch)
        else:
            ev.wait()                        # flusher will fill + signal
            if item["out"] is None and item in self._pop_stale():
                self._flush([item])          # flusher missed us (race)
        return item["out"]

    def _pop_stale(self):
        with self._lock:
            stale, self._queue = self._queue, []
        return stale

    def _flush(self, batch: list[dict]) -> None:
        profiles = np.stack([b["profile"] for b in batch])
        bids = np.stack([b["bids"] for b in batch])
        ctx = np.stack([b["ctx"] for b in batch])
        outs = self.scorer.score_batch(profiles, bids, ctx,
                                       [b["cands"] for b in batch])
        for b, o in zip(batch, outs):
            b["out"] = o
            b["ev"].set()


@dataclasses.dataclass
class SparseRankPredictor:
    """Predictor-shaped adapter for serve/api.py over a DeviceScorer:
    holds host-side per-user state (profile rows, behavior cache, ctx) and
    answers rank(user_id, item_ids) by shipping ids — not features — to
    the device. Implements the `rank_direct` duck-type RecApiServer
    prefers over the host-assembly Rank path (api.go:106-131 semantics)."""
    scorer: DeviceScorer
    user_profiles: np.ndarray           # [n_users, U] f32
    user_behaviors: np.ndarray          # [n_users, T] i32, -1 padded
    default_ctx: np.ndarray             # [C] f32
    batcher: Optional[MicroBatcher] = None
    rec_sys: object = None              # dashboard endpoints (optional)

    def __post_init__(self):
        if self.batcher is None:
            self.batcher = MicroBatcher(self.scorer)

    def rank_direct(self, user_id: int, item_ids: list[int]
                    ) -> list[tuple[int, float]]:
        n_users = self.user_profiles.shape[0]
        uid = user_id if 0 <= user_id < n_users else 0
        prof = self.user_profiles[uid]
        bids = self.user_behaviors[uid]
        scores = self.batcher.submit(prof, bids, self.default_ctx,
                                     np.asarray(item_ids, np.int32))
        return [(int(i), float(s)) for i, s in zip(item_ids, scores)]
