"""ML-20M-statistics fixture generator + parity-pipeline plumbing."""
import sqlite3

import numpy as np
import pytest

from goctr_tpu.data.ml20m import SignalKnobs, generate_ml20m_fixture


@pytest.fixture(scope="module")
def tiny_db(tmp_path_factory):
    path = tmp_path_factory.mktemp("ml20m") / "tiny.db"
    stats = generate_ml20m_fixture(path, scale=0.004, seed=3,
                                   oversample=2.0)
    return path, stats


def test_generator_statistics(tiny_db):
    path, stats = tiny_db
    c = sqlite3.connect(path)
    n = c.execute("SELECT count(*) FROM ratings").fetchone()[0]
    assert n == stats["n_ratings"]
    # realistic rating stats: mean ~3.5, positives ~45-50%
    assert 3.3 < stats["mean_rating"] < 3.8
    assert 0.40 < stats["pos_rate"] < 0.55
    # one rating per (user, movie)
    dup = c.execute("SELECT count(*) FROM (SELECT userId, movieId FROM "
                    "ratings GROUP BY userId, movieId HAVING count(*) > 1)"
                    ).fetchone()[0]
    assert dup == 0
    # by-user split: train/test user sets disjoint
    both = c.execute(
        "SELECT count(*) FROM (SELECT DISTINCT userId FROM ratings_train "
        "INTERSECT SELECT DISTINCT userId FROM ratings_test)").fetchone()[0]
    assert both == 0
    # derived tables exist and are per-user
    for t in ("user_feature_train", "user_feature_test", "ub_train",
              "ub_test"):
        assert c.execute(f"SELECT count(*) FROM {t}").fetchone()[0] > 0


def test_vectorized_assembly_matches_per_row(tiny_db):
    """The array fast path (sample_generator_arrays + get_user_behaviors_bulk
    + vectorized word-row mapping) must produce the same matrix as the
    per-row Sample path."""
    from goctr_tpu.data.movielens import MovielensRec
    from goctr_tpu.recommend.rcmd import Context, Stage, _State, get_sample

    path, _ = tiny_db
    rec = MovielensRec(str(path), sample_cnt=3000)
    ctx = Context(stage=Stage.TRAIN)
    state = _State()
    rec.pre_train(ctx)
    from goctr_tpu.embedding.store import train_embedding
    state.item_embedding_map = train_embedding(
        rec.item_seq_generator(ctx), window=5, dim=16, iters=1)
    fast = get_sample(rec, ctx, state)

    # strip the array hooks → per-row path on a fresh provider
    class SlowRec(MovielensRec):
        sample_generator_arrays = None
        get_user_behaviors_bulk = None

        def __getattribute__(self, name):
            if name in ("sample_generator_arrays",
                        "get_user_behaviors_bulk"):
                raise AttributeError(name)
            return super().__getattribute__(name)

    slow_rec = SlowRec(str(path), sample_cnt=3000)
    slow_rec.pre_train(ctx)
    slow_state = _State()
    slow_state.item_embedding_map = state.item_embedding_map
    assert not hasattr(slow_rec, "sample_generator_arrays")
    slow = get_sample(slow_rec, ctx, slow_state)

    assert fast.x.shape == slow.x.shape
    np.testing.assert_allclose(fast.x, slow.x, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(fast.y, slow.y)
