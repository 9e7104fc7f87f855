"""Orchestrator pipeline tests with an in-memory RecSys implementing the
full optional-interface surface (the hermetic analogue of the reference's
movielens integration tests, SURVEY.md §4 tier 4)."""
import numpy as np
import pytest

from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.recommend import (
    BatchPredict, Context, ITEM_EMB_DIM, Rank, RankerFitter, Sample, Stage,
    Train, USER_BEHAVIOR_LEN, get_sample,
)

N_USERS, N_ITEMS = 50, 120


class FakeRec:
    """Planted taste: user u likes items with (item % 10) == (u % 10)."""

    def __init__(self, n_samples=3000, seed=0):
        self.rng = np.random.default_rng(seed)
        self.n_samples = n_samples
        self.pre_train_called = 0
        self.pre_rank_called = 0
        # per-user behavior history: items the user liked, ts ascending ids
        self.history = {
            u: [int(x) for x in
                np.arange(u % 10, N_ITEMS, 10)[self.rng.permutation(12)][:8]]
            for u in range(N_USERS)
        }

    # --- required surface -------------------------------------------------
    def get_user_feature(self, ctx, user_id):
        if user_id >= N_USERS:
            raise KeyError(user_id)
        onehot = np.zeros(10, np.float32)
        onehot[user_id % 10] = 1.0
        return np.concatenate([onehot, [user_id / N_USERS]])

    def get_item_feature(self, ctx, item_id):
        if item_id >= N_ITEMS:
            raise KeyError(item_id)
        onehot = np.zeros(10, np.float32)
        onehot[item_id % 10] = 1.0
        return np.concatenate([onehot, [item_id / N_ITEMS]])

    def sample_generator(self, ctx):
        for i in range(self.n_samples):
            u = int(self.rng.integers(0, N_USERS))
            it = int(self.rng.integers(0, N_ITEMS))
            label = 1.0 if (it % 10) == (u % 10) else 0.0
            if self.rng.random() < 0.1:   # label noise
                label = 1.0 - label
            yield Sample(user_id=u, item_id=it, label=label,
                         timestamp=1000 + i)

    # --- optional surface -------------------------------------------------
    def get_user_behavior(self, ctx, user_id, max_len, max_pk, max_ts):
        return self.history.get(user_id, [])[:max_len]

    def item_seq_generator(self, ctx):
        for u, items in self.history.items():
            yield [str(i) for i in items]

    def pre_train(self, ctx):
        self.pre_train_called += 1

    def pre_rank(self, ctx):
        self.pre_rank_called += 1


@pytest.fixture(scope="module")
def trained():
    rec = FakeRec()
    fitter = RankerFitter(
        "mlp", TrainerConfig(batch_size=256, epochs=12, early_stop=0,
                             lr=5e-3))
    ctx = Context()
    predictor = Train(ctx, rec, fitter)
    return rec, predictor


def test_train_pipeline_calls_hooks(trained):
    rec, predictor = trained
    assert rec.pre_train_called == 1
    assert predictor.item_embedding_map is not None
    assert len(predictor.item_embedding_map) > 0


def test_sample_layout(trained):
    rec, _ = trained
    sample = get_sample(rec, Context())
    info = sample.info
    assert info.user_profile_range == (0, 11)
    assert info.user_behavior_range == (11, 11 + ITEM_EMB_DIM * USER_BEHAVIOR_LEN)
    ub_end = 11 + ITEM_EMB_DIM * USER_BEHAVIOR_LEN
    assert info.item_feature_range == (ub_end, ub_end + ITEM_EMB_DIM)
    assert info.ctx_feature_range == (ub_end + ITEM_EMB_DIM,
                                      ub_end + ITEM_EMB_DIM + 11)
    assert sample.x.shape[1] == info.ctx_feature_range[1]


def test_rank_orders_matching_items_first(trained):
    rec, predictor = trained
    ctx = Context()
    user = 7   # likes items ≡ 7 (mod 10)
    items = list(range(20))
    scores = Rank(ctx, predictor, user, items)
    assert rec.pre_rank_called >= 1
    by_score = sorted(scores, key=lambda s: -s.score)
    top3 = {s.item_id % 10 for s in by_score[:3]}
    assert 7 in top3
    match_avg = np.mean([s.score for s in scores if s.item_id % 10 == 7])
    other_avg = np.mean([s.score for s in scores if s.item_id % 10 != 7])
    assert match_avg > other_avg


def test_batch_predict_zero_fills_bad_rows(trained):
    rec, predictor = trained
    keys = [Sample(user_id=1, item_id=1), Sample(user_id=9999, item_id=1)]
    scores = BatchPredict(Context(), predictor, keys)
    assert scores.shape == (2,)   # bad row zero-filled, not dropped


def test_batch_predict_first_row_failure_raises(trained):
    rec, predictor = trained
    with pytest.raises(KeyError):
        BatchPredict(Context(), predictor,
                     [Sample(user_id=9999, item_id=1)])


def test_debug_hooks_log_feature_and_score(trained, caplog):
    """DEBUG_USER_ID/DEBUG_ITEM_ID print the assembled feature vector and
    score for the chosen pair (rcmd.go:43-44,319-323,334)."""
    import logging

    from goctr_tpu.recommend import rcmd
    rec, predictor = trained
    rcmd.DEBUG_USER_ID, rcmd.DEBUG_ITEM_ID = 3, 13
    try:
        with caplog.at_level(logging.INFO, logger="goctr_tpu.recommend.rcmd"):
            BatchPredict(Context(), predictor,
                         [Sample(user_id=3, item_id=13),
                          Sample(user_id=4, item_id=13),   # user mismatch
                          Sample(user_id=3, item_id=14)])  # item mismatch
    finally:
        rcmd.DEBUG_USER_ID = rcmd.DEBUG_ITEM_ID = 0
    msgs = [r.message for r in caplog.records if "user 3: item 13" in r.message]
    assert any("feature" in m for m in msgs)
    assert any("score" in m for m in msgs)
    assert not any("user 4" in r.message or "item 14" in r.message
                   for r in caplog.records)


def test_stage_routing():
    ctx = Context()
    assert ctx.stage == Stage.TRAIN
    pctx = ctx.with_stage(Stage.PREDICT)
    assert pctx.stage == Stage.PREDICT and ctx.stage == Stage.TRAIN


def test_din_fitter_on_pipeline():
    rec = FakeRec(n_samples=1500, seed=1)
    fitter = RankerFitter(
        "din", TrainerConfig(batch_size=256, epochs=3, early_stop=0),
        activation="relu")
    predictor = Train(Context(), rec, fitter)
    scores = Rank(Context(), predictor, 3, list(range(10)))
    assert len(scores) == 10
    assert all(0 <= s.score <= 1 for s in scores)


class CooccurRec:
    """Label signal reachable ONLY through item2vec co-occurrence: user/item
    features are id-hash noise; label = candidate's latent cluster == user's
    taste; behavior sequences co-occur within the taste cluster. The
    downstream mirror of the reference's neighbor-quality protocol
    (/root/reference/README.md:142-157, wordemb_test.go)."""

    def __init__(self, n_users=120, n_items=80, n_samples=4000, seed=0):
        self.rng = np.random.default_rng(seed)
        self.n_users, self.n_items, self.n_samples = n_users, n_items, n_samples
        # latent: cluster = item parity, taste = user parity (NOT in features)
        self.history = {
            u: [int(x) for x in self.rng.choice(
                np.arange(u % 2, n_items, 2), size=10, replace=False)]
            for u in range(n_users)
        }
        # richer item2vec corpus than the 10-item behavior window: 20 session
        # docs per user drawn from the taste cluster (the pipeline trains
        # embeddings with reference defaults — 1 iter, subsample 1e-3 — which
        # need a realistic corpus size to separate clusters)
        self.sessions = [
            [str(int(x)) for x in self.rng.choice(
                np.arange(u % 2, n_items, 2), size=40)]
            for u in range(n_users) for _ in range(20)
        ]

    def _noise(self, salt, k):
        return np.asarray(
            np.sin(np.arange(4) * 1.7 + salt * 12.9898 + k), np.float32)

    def get_user_feature(self, ctx, user_id):
        return self._noise(1, user_id)

    def get_item_feature(self, ctx, item_id):
        return self._noise(2, item_id)

    def sample_generator(self, ctx):
        for i in range(self.n_samples):
            u = int(self.rng.integers(0, self.n_users))
            it = int(self.rng.integers(0, self.n_items))
            yield Sample(user_id=u, item_id=it,
                         label=1.0 if (it % 2) == (u % 2) else 0.0,
                         timestamp=1000 + i)

    def get_user_behavior(self, ctx, user_id, max_len, max_pk, max_ts):
        return self.history.get(user_id, [])[:max_len]

    def item_seq_generator(self, ctx):
        yield from self.sessions


class _HideItemSeq:
    """Proxy hiding item_seq_generator → Train() skips item2vec entirely."""

    def __init__(self, inner):
        object.__setattr__(self, "_inner", inner)

    def __getattr__(self, name):
        if name == "item_seq_generator":
            raise AttributeError(name)
        return getattr(self._inner, name)


def _cooccur_auc(rec):
    from goctr_tpu.core.metrics import roc_auc_score

    fitter = RankerFitter(
        "din", TrainerConfig(batch_size=256, epochs=12, early_stop=0,
                             lr=5e-3, l2=0.0), activation="relu")
    predictor = Train(Context(), rec, fitter)
    inner = rec._inner if isinstance(rec, _HideItemSeq) else rec
    test = [Sample(user_id=u, item_id=it,
                   label=1.0 if (it % 2) == (u % 2) else 0.0)
            for u in range(0, inner.n_users, 3)
            for it in range(0, inner.n_items, 2)]
    scores = BatchPredict(Context(), predictor, test)
    y = np.asarray([s.label for s in test])
    return roc_auc_score(y, scores)


def test_item2vec_carries_cooccurrence_signal_downstream():
    """DIN AUC with item2vec ≫ without (zero embedding blocks): proves the
    embeddings, not the features, carry the cluster signal end-to-end."""
    a_with = _cooccur_auc(CooccurRec(seed=3))
    a_without = _cooccur_auc(_HideItemSeq(CooccurRec(seed=3)))
    assert a_with > 0.75, f"with embeddings {a_with}"
    assert a_without < 0.62, f"without embeddings {a_without}"
