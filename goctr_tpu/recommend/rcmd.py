"""Recommendation orchestrator: the user-facing Train / Rank / BatchPredict
pipeline (TPU re-architecture of /root/reference/recommend/rcmd.go).

The contract mirrors the reference's interface-driven design (rcmd.go:72-182):
a user object implements `get_user_feature` / `get_item_feature` /
`sample_generator`, optionally `get_user_behavior`, `item_seq_generator`,
`pre_train`, `pre_rank` — composed by duck-typed hasattr checks, the Python
analogue of Go type assertions (rcmd.go:199,207,279,509).

Sample row layout (identical to rcmd.go:400-447):
    [ user_profile | behavior_emb (T×D) | item_emb (D) | item_raw→ctx ]
with ITEM_EMB_DIM=16, USER_BEHAVIOR_LEN=10 (rcmd.go:19-28). The reference's
16-goroutine assembly fan-out (rcmd.go:375-397) becomes a thread pool for
IO-bound feature fetches feeding one NumPy matrix.
"""
from __future__ import annotations

import dataclasses
import enum
import logging
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterable, Iterator, Optional, Protocol

import numpy as np

from goctr_tpu.embedding.store import EmbeddingMap, train_embedding
from goctr_tpu.models.base import SampleInfo, TrainSample

log = logging.getLogger(__name__)

SAMPLE_ASSEMBLER = 16        # rcmd.go:20
ITEM_EMB_DIM = 16            # rcmd.go:22
ITEM_EMB_WINDOW = 5          # rcmd.go:23
USER_BEHAVIOR_LEN = 10       # rcmd.go:24
USER_FEATURE_CACHE_SIZE = 200_000
ITEM_FEATURE_CACHE_SIZE = 2_000_000

# Debug hooks (rcmd.go:43-44): set DEBUG_ITEM_ID (and optionally
# DEBUG_USER_ID; 0/-1 = any user) to log the assembled feature vector and
# score for matching (user, item) pairs during BatchPredict
# (rcmd.go:319-323,334).
DEBUG_USER_ID: int = 0
DEBUG_ITEM_ID: int = 0


class Stage(enum.Enum):
    TRAIN = 0
    PREDICT = 1


@dataclasses.dataclass
class Context:
    """Replaces Go's context.WithValue(StageKey, ...) stage routing."""
    stage: Stage = Stage.TRAIN
    values: dict = dataclasses.field(default_factory=dict)

    def with_stage(self, stage: Stage) -> "Context":
        return Context(stage=stage, values=self.values)


@dataclasses.dataclass
class Sample:
    user_id: int
    item_id: int
    label: float = 0.0
    timestamp: int = 0


@dataclasses.dataclass
class ItemScore:
    item_id: int
    score: float


class LRUCache:
    """Feature cache (replaces ccache, rcmd.go:344-353)."""

    def __init__(self, max_size: int):
        self.max_size = max_size
        self._d: OrderedDict[Any, Any] = OrderedDict()

    def fetch(self, key, fn):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        v = fn()
        self._d[key] = v
        if len(self._d) > self.max_size:
            self._d.popitem(last=False)
        return v

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()


# ---------------------------------------------------------------- fitters ---

class PredictAbstract(Protocol):
    def predict(self, x: np.ndarray) -> np.ndarray: ...


class RankerFitter:
    """Fitter building a DIN / YouTube-DNN / MLP ranker from the assembled
    sample (the counterpart of dinimpl.Fit / SimpleMlpFitWrap.Fit)."""

    def __init__(self, model_name: str = "mlp", trainer_config=None,
                 use_bf16: Optional[bool] = None, **model_kw):
        self.model_name = model_name
        self.trainer_config = trainer_config
        self.model_kw = model_kw
        if use_bf16 is not None and "compute_dtype" not in model_kw:
            from goctr_tpu.core.dtypes import default_policy
            self.model_kw["compute_dtype"] = \
                default_policy(use_bf16).compute_dtype
        self.ranker = None

    def fit(self, sample: TrainSample):
        from goctr_tpu.models import DIN, MLPTower, YoutubeDNN, train_ranker
        from goctr_tpu.models.trainer import TrainerConfig

        info = sample.info
        up, t, d, it, cx = info.dims(USER_BEHAVIOR_LEN)
        name = self.model_name.lower()
        if name == "din":
            model = DIN(up, t, d, it, cx, **self.model_kw)
        elif name in ("youtube_dnn", "youtube", "ytdnn"):
            model = YoutubeDNN(up, t, d, it, cx, **self.model_kw)
        else:
            model = MLPTower(in_dim=sample.x_cols, **self.model_kw)
        cfg = self.trainer_config or TrainerConfig()
        self.ranker = train_ranker(model, sample, cfg)
        return self.ranker


@dataclasses.dataclass
class Predictor:
    """Train() result: feature provider + fitted model (rcmd.go:232-243)."""
    rec_sys: Any
    model: PredictAbstract
    item_embedding_map: Optional[EmbeddingMap] = None


# ----------------------------------------------------------- sample build ---

class _State:
    """Per-Train() mutable state (replaces reference package globals
    rcmd.go:30-45; kept instance-local so concurrent trains don't collide)."""

    def __init__(self):
        self.user_cache = LRUCache(USER_FEATURE_CACHE_SIZE)
        self.item_cache = LRUCache(ITEM_FEATURE_CACHE_SIZE)
        self.item_embedding_map: Optional[EmbeddingMap] = None


def get_sample_vector(ctx: Context, state: _State, rec_sys,
                      key: Sample) -> tuple[np.ndarray, int, int]:
    """One flat row (GetSampleVector rcmd.go:462-536): returns
    (vec, user_width, item_width)."""
    user = state.user_cache.fetch(
        key.user_id, lambda: np.asarray(
            rec_sys.get_user_feature(ctx, key.user_id), dtype=np.float32))
    item = state.item_cache.fetch(
        key.item_id, lambda: np.asarray(
            rec_sys.get_item_feature(ctx, key.item_id), dtype=np.float32))

    emb_map = state.item_embedding_map
    item_emb = np.zeros(ITEM_EMB_DIM, np.float32)
    behaviors = np.zeros(ITEM_EMB_DIM * USER_BEHAVIOR_LEN, np.float32)
    if emb_map:
        item_emb = emb_map.get_vec(str(key.item_id), ITEM_EMB_DIM)
        if hasattr(rec_sys, "get_user_behavior"):
            item_seq = rec_sys.get_user_behavior(
                ctx, key.user_id, USER_BEHAVIOR_LEN, -1, key.timestamp)
            for i, item_id in enumerate(item_seq[:USER_BEHAVIOR_LEN]):
                behaviors[i * ITEM_EMB_DIM:(i + 1) * ITEM_EMB_DIM] = \
                    emb_map.get_vec(str(item_id), ITEM_EMB_DIM)

    vec = np.concatenate([user, behaviors, item_emb, item])
    return vec, user.shape[0], item.shape[0]


def get_sample(rec_sys, ctx: Context,
               state: Optional[_State] = None) -> TrainSample:
    """Assemble the whole training matrix (GetSample rcmd.go:339-460).

    Fast path: providers exposing get_user_features_batch /
    get_item_features_batch get vectorized assembly (unique-id batch SQL +
    native gather-concat, dropping rows with missing features like the
    reference's per-sample skip, rcmd.go:385-388). Otherwise: threaded
    per-sample fetch mirroring the 16-goroutine fan-out.
    """
    state = state or _State()
    if (hasattr(rec_sys, "get_user_features_batch")
            and hasattr(rec_sys, "get_item_features_batch")):
        return _get_sample_vectorized(rec_sys, ctx, state)
    samples: Iterator[Sample] = rec_sys.sample_generator(ctx)

    rows: list[np.ndarray] = []
    labels: list[float] = []
    u_width = i_width = -1

    def assemble(s: Sample):
        try:
            return s, get_sample_vector(ctx, state, rec_sys, s)
        except Exception as e:     # drop bad samples (rcmd.go:385-388)
            log.debug("get sample vector error: %s", e)
            return s, None

    with ThreadPoolExecutor(max_workers=SAMPLE_ASSEMBLER) as pool:
        for s, res in pool.map(assemble, samples, chunksize=64):
            if res is None:
                continue
            vec, uw, iw = res
            if u_width < 0:
                u_width, i_width = uw, iw
            elif uw != u_width or iw != i_width:
                raise ValueError(
                    f"feature width mismatch: user {uw}!={u_width} "
                    f"item {iw}!={i_width}")
            rows.append(vec)
            labels.append(s.label)

    if not rows:
        raise ValueError("no samples assembled")
    x = np.stack(rows)
    y = np.asarray(labels, dtype=np.float32)
    ub0 = u_width
    ub1 = ub0 + ITEM_EMB_DIM * USER_BEHAVIOR_LEN
    it1 = ub1 + ITEM_EMB_DIM
    info = SampleInfo(
        user_profile_range=(0, u_width),
        user_behavior_range=(ub0, ub1),
        item_feature_range=(ub1, it1),    # embeddings only (rcmd.go:408-409)
        ctx_feature_range=(it1, it1 + i_width),  # raw item feats → ctx
    )
    return TrainSample(x=x, y=y, info=info)


def _get_sample_vectorized(rec_sys, ctx: Context,
                           state: _State) -> TrainSample:
    keys = list(rec_sys.sample_generator(ctx))
    if not keys:
        raise ValueError("no samples generated")
    users = _fetch_features_unique(
        ctx, state, rec_sys, list({k.user_id for k in keys}), "user")
    items = _fetch_features_unique(
        ctx, state, rec_sys, list({k.item_id for k in keys}), "item")
    # training drops rows whose features are missing (rcmd.go:385-388)
    kept = [k for k in keys if k.user_id in users and k.item_id in items]
    dropped = len(keys) - len(kept)
    if dropped:
        log.debug("dropped %d samples with missing features", dropped)
    if not kept:
        raise ValueError("no samples assembled")
    x = _assemble_rows(ctx, state, rec_sys, kept, users, items)
    y = np.asarray([k.label for k in kept], dtype=np.float32)
    u_width = next(iter(users.values())).shape[0]
    i_width = next(iter(items.values())).shape[0]
    ub0 = u_width
    ub1 = ub0 + ITEM_EMB_DIM * USER_BEHAVIOR_LEN
    it1 = ub1 + ITEM_EMB_DIM
    info = SampleInfo(
        user_profile_range=(0, u_width),
        user_behavior_range=(ub0, ub1),
        item_feature_range=(ub1, it1),
        ctx_feature_range=(it1, it1 + i_width),
    )
    return TrainSample(x=x, y=y, info=info)


def _assemble_rows(ctx, state, rec_sys, keys, users, items) -> np.ndarray:
    """Shared vectorized row materialization (used by training fast path
    and BatchPredict; zero row 0 backs missing ids)."""
    from goctr_tpu.native.hashing import gather_rows_concat

    uw = next(iter(users.values())).shape[0] if users else 0
    iw = next(iter(items.values())).shape[0] if items else 0
    n = len(keys)
    u_mat = np.zeros((len(users) + 1, uw), np.float32)
    u_idx_of = {}
    for r, (i, row) in enumerate(users.items(), start=1):
        u_mat[r] = row
        u_idx_of[i] = r
    i_mat = np.zeros((len(items) + 1, iw), np.float32)
    i_idx_of = {}
    for r, (i, row) in enumerate(items.items(), start=1):
        i_mat[r] = row
        i_idx_of[i] = r
    u_idx = np.asarray([u_idx_of.get(k.user_id, 0) for k in keys], np.int64)
    i_idx = np.asarray([i_idx_of.get(k.item_id, 0) for k in keys], np.int64)

    emb_map = state.item_embedding_map
    ub_flat = np.zeros((n, ITEM_EMB_DIM * USER_BEHAVIOR_LEN), np.float32)
    item_emb = np.zeros((n, ITEM_EMB_DIM), np.float32)
    if emb_map:
        words, emb_mat = emb_map.as_arrays()
        emb_mat = np.concatenate(
            [np.zeros((1, emb_mat.shape[1]), np.float32), emb_mat])
        row_of = {w: r for r, w in enumerate(words, start=1)}
        item_emb_idx = np.asarray(
            [row_of.get(str(k.item_id), 0) for k in keys], np.int64)
        item_emb = emb_mat[item_emb_idx]
        if hasattr(rec_sys, "get_user_behavior"):
            beh_idx = np.zeros((n, USER_BEHAVIOR_LEN), np.int64)
            seq_cache: dict[tuple, list] = {}
            for r, k in enumerate(keys):
                ck = (k.user_id, k.timestamp)
                seq = seq_cache.get(ck)
                if seq is None:
                    seq = rec_sys.get_user_behavior(
                        ctx, k.user_id, USER_BEHAVIOR_LEN, -1, k.timestamp)
                    seq_cache[ck] = seq
                for j, item_id in enumerate(seq[:USER_BEHAVIOR_LEN]):
                    beh_idx[r, j] = row_of.get(str(item_id), 0)
            ub_flat = emb_mat[beh_idx].reshape(n, -1)

    return gather_rows_concat([
        (u_mat, u_idx),
        (ub_flat, np.arange(n, dtype=np.int64)),
        (item_emb, np.arange(n, dtype=np.int64)),
        (i_mat, i_idx),
    ])


# ------------------------------------------------------------ entrypoints ---

def Train(ctx: Context, rec_sys, fitter) -> Predictor:
    """Training pipeline (rcmd.go:196-246): PreTrain → item2vec → sample
    assembly → fit."""
    ctx = ctx.with_stage(Stage.TRAIN)
    state = _State()

    if hasattr(rec_sys, "pre_train"):
        rec_sys.pre_train(ctx)

    if hasattr(rec_sys, "item_seq_generator"):
        t0 = time.perf_counter()
        seqs = rec_sys.item_seq_generator(ctx)
        state.item_embedding_map = train_embedding(
            seqs, window=ITEM_EMB_WINDOW, dim=ITEM_EMB_DIM, iters=1)
        log.info("item2vec: %d embeddings in %.1fs",
                 len(state.item_embedding_map), time.perf_counter() - t0)

    sample = get_sample(rec_sys, ctx, state)
    log.info("start training with %d x %d samples", sample.rows,
             sample.x_cols)
    model = fitter.fit(sample)
    pred = Predictor(rec_sys=rec_sys, model=model,
                     item_embedding_map=state.item_embedding_map)
    pred._state = state   # keep caches warm for serving (reference reuses
    #                       the same package-level caches, rcmd.go:34-36)
    return pred


def BatchPredict(ctx: Context, predictor: Predictor,
                 sample_keys: list[Sample]) -> np.ndarray:
    """Scores [n] (rcmd.go:277-337): PredictStage feature sourcing, PreRank
    hook, zero-fill for rows whose features fail after the first.

    Assembly is vectorized: features are fetched once per unique user/item
    (batch SQL when the provider implements get_*_features_batch), behavior
    embeddings resolve through one indexed gather, and rows materialize via
    the native gather-concat kernel — replacing the reference's per-sample
    loop (rcmd.go:294-324)."""
    ctx = ctx.with_stage(Stage.PREDICT)
    rec_sys = predictor.rec_sys
    if hasattr(rec_sys, "pre_rank"):
        rec_sys.pre_rank(ctx)

    state = getattr(predictor, "_state", None) or _State()
    state.item_embedding_map = predictor.item_embedding_map
    x = _assemble_batch(ctx, state, rec_sys, sample_keys)
    scores = np.asarray(predictor.model.predict(x)).ravel()
    if DEBUG_ITEM_ID > 0:
        for i, k in enumerate(sample_keys):
            if k.item_id == DEBUG_ITEM_ID and \
                    DEBUG_USER_ID in (0, -1, k.user_id):
                log.info("user %d: item %d: feature %s", k.user_id,
                         k.item_id, x[i].tolist())
                log.info("user %d: item %d: score %s", k.user_id,
                         k.item_id, scores[i])
    return scores


def _fetch_features_unique(ctx, state: _State, rec_sys, ids: list[int],
                           kind: str) -> dict[int, np.ndarray]:
    """id → feature row for unique ids, preferring the provider's batch
    method, caching every hit."""
    cache = state.user_cache if kind == "user" else state.item_cache
    single = getattr(rec_sys, f"get_{kind}_feature")
    batch = getattr(rec_sys, f"get_{kind}_features_batch", None)
    out: dict[int, np.ndarray] = {}
    missing: list[int] = []
    for i in ids:
        hit = cache._d.get(i)
        if hit is not None:
            out[i] = hit
        else:
            missing.append(i)
    if missing and batch is not None:
        fetched = batch(ctx, missing)   # id → row (absent = failed)
        for i, row in fetched.items():
            row = np.asarray(row, dtype=np.float32)
            out[i] = row
            cache.fetch(i, lambda r=row: r)
        missing = [i for i in missing if i not in fetched]
    for i in missing:
        try:
            row = np.asarray(single(ctx, i), dtype=np.float32)
        except Exception as e:
            log.debug("%s feature fetch failed for %s: %s", kind, i, e)
            continue
        out[i] = row
        cache.fetch(i, lambda r=row: r)
    return out


def _assemble_batch(ctx: Context, state: _State, rec_sys,
                    keys: list[Sample]) -> np.ndarray:
    users = _fetch_features_unique(
        ctx, state, rec_sys, list({k.user_id for k in keys}), "user")
    items = _fetch_features_unique(
        ctx, state, rec_sys, list({k.item_id for k in keys}), "item")
    if keys and keys[0].user_id not in users:
        raise KeyError(f"userId {keys[0].user_id} not found")
    if keys and keys[0].item_id not in items:
        raise KeyError(f"itemId {keys[0].item_id} not found")
    # rows with missing ids hit the zero row → reference zero-fill
    # semantics (rcmd.go:300-307)
    return _assemble_rows(ctx, state, rec_sys, keys, users, items)


def Rank(ctx: Context, predictor: Predictor, user_id: int,
         item_ids: list[int]) -> list[ItemScore]:
    """Score a candidate list for one user (rcmd.go:248-275)."""
    now = int(time.time())
    keys = [Sample(user_id=user_id, item_id=i, timestamp=now)
            for i in item_ids]
    scores = BatchPredict(ctx, predictor, keys)
    return [ItemScore(item_id=i, score=float(s))
            for i, s in zip(item_ids, scores)]
