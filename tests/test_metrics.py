"""Metrics golden-value tests vs sklearn oracle (test-only dependency).

Mirrors the reference's tier-1 strategy (SURVEY.md §4): hand-computed /
sklearn-derived golden values for every metric, plus jittable-AUC equivalence
and GAUC definition checks.
"""
import numpy as np
import pytest
import sklearn.metrics as skm

from goctr_tpu.core import metrics as M


def test_roc_auc_matches_sklearn(rng):
    for _ in range(5):
        y = rng.integers(0, 2, 500)
        s = rng.random(500)
        assert M.roc_auc_score(y, s) == pytest.approx(skm.roc_auc_score(y, s), abs=1e-12)


def test_roc_auc_with_ties(rng):
    y = rng.integers(0, 2, 1000)
    s = rng.integers(0, 10, 1000).astype(float)  # heavy ties
    assert M.roc_auc_score(y, s) == pytest.approx(skm.roc_auc_score(y, s), abs=1e-12)


def test_roc_auc_jit_matches_numpy(rng):
    import jax.numpy as jnp
    y = rng.integers(0, 2, 777)
    s = rng.integers(0, 50, 777).astype(np.float32) / 50.0  # includes ties
    got = float(M.roc_auc_jit(jnp.asarray(s), jnp.asarray(y)))
    assert got == pytest.approx(skm.roc_auc_score(y, s), abs=1e-5)


def test_roc_curve_endpoints(rng):
    y = rng.integers(0, 2, 100)
    s = rng.random(100)
    fpr, tpr, thr = M.roc_curve(y, s)
    assert fpr[0] == 0 and tpr[0] == 0
    assert fpr[-1] == pytest.approx(1) and tpr[-1] == pytest.approx(1)
    sk_fpr, sk_tpr, _ = skm.roc_curve(y, s, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)


def test_average_precision(rng):
    y = rng.integers(0, 2, 300)
    s = rng.random(300)
    assert M.average_precision_score(y, s) == pytest.approx(
        skm.average_precision_score(y, s), abs=1e-10)


def test_gauc_basic():
    # two users; one perfectly ranked, one inverted
    y = np.array([1, 0, 1, 0])
    s = np.array([0.9, 0.1, 0.1, 0.9])
    g = np.array([1, 1, 2, 2])
    assert M.gauc(y, s, g) == pytest.approx(0.5)


def test_gauc_skips_single_class_groups():
    y = np.array([1, 1, 1, 0])
    s = np.array([0.9, 0.8, 0.7, 0.1])
    g = np.array([1, 1, 2, 2])   # group 1 is all-positive → skipped
    assert M.gauc(y, s, g) == pytest.approx(1.0)


def test_gauc_weighting(rng):
    y = rng.integers(0, 2, 400)
    s = rng.random(400)
    g = rng.integers(0, 20, 400)
    # uniform vs count weighting should both be finite and in [0,1]
    for w in ("count", "pos", "uniform"):
        v = M.gauc(y, s, g, weight=w)
        assert 0.0 <= v <= 1.0


def test_gauc_jit_matches_np(rng):
    """On-device segment GAUC must equal the exact host loop, including with
    score ties, singleton groups, and single-class groups."""
    import jax.numpy as jnp

    for trial in range(4):
        n = 500 + 17 * trial
        y = rng.integers(0, 2, n)
        # quantized scores force plenty of ties
        s = np.round(rng.random(n), 2 if trial % 2 else 4)
        g = rng.integers(0, 10 + 30 * trial, n)
        want = M.gauc_np(y, s, g, weight="count")
        got = float(M.gauc_jit(jnp.asarray(s), jnp.asarray(y), jnp.asarray(g)))
        assert got == pytest.approx(want, abs=1e-5), f"trial {trial}"


def test_gauc_jit_edge_cases():
    import jax.numpy as jnp

    # perfectly ranked vs inverted groups (matches test_gauc_basic)
    y = jnp.array([1, 0, 1, 0], jnp.float32)
    s = jnp.array([0.9, 0.1, 0.1, 0.9], jnp.float32)
    g = jnp.array([1, 1, 2, 2])
    assert float(M.gauc_jit(s, y, g)) == pytest.approx(0.5)
    # single-class group skipped
    y = jnp.array([1, 1, 1, 0], jnp.float32)
    s = jnp.array([0.9, 0.8, 0.7, 0.1], jnp.float32)
    assert float(M.gauc_jit(s, y, g)) == pytest.approx(1.0)


def test_classification_metrics(rng):
    y = rng.integers(0, 3, 200)
    p = rng.integers(0, 3, 200)
    assert M.accuracy_score(y, p) == pytest.approx(skm.accuracy_score(y, p))
    np.testing.assert_allclose(M.confusion_matrix(y, p), skm.confusion_matrix(y, p))
    for avg in ("micro", "macro", "weighted"):
        assert M.precision_score(y, p, avg) == pytest.approx(
            skm.precision_score(y, p, average=avg, zero_division=0), abs=1e-10)
        assert M.recall_score(y, p, avg) == pytest.approx(
            skm.recall_score(y, p, average=avg, zero_division=0), abs=1e-10)
        assert M.f1_score(y, p, avg) == pytest.approx(
            skm.f1_score(y, p, average=avg, zero_division=0), abs=1e-10)


def test_regression_metrics(rng):
    y = rng.random(100)
    p = y + rng.normal(0, 0.1, 100)
    assert M.r2_score(y, p) == pytest.approx(skm.r2_score(y, p), abs=1e-10)
    assert M.mean_squared_error(y, p) == pytest.approx(
        skm.mean_squared_error(y, p), abs=1e-12)
    assert M.mean_absolute_error(y, p) == pytest.approx(
        skm.mean_absolute_error(y, p), abs=1e-12)


def test_log_loss(rng):
    y = rng.integers(0, 2, 100)
    p = rng.random(100)
    assert M.log_loss(y, p) == pytest.approx(skm.log_loss(y, p), abs=1e-6)
