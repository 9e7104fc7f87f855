"""sklearn-port MLPClassifier tests.

Tier-2 (SURVEY.md §4): numerical-gradient verification against finite
differences (the reference's strongest pattern,
nn/neural_network/multilayer_perceptron_test.go:68-121), plus behavior
parity spot-checks against sklearn itself.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goctr_tpu.models.mlp_classifier import MLPClassifier, _maxabs_scale


def _make_blobs(n=600, seed=0, classes=2):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 4, (classes, 5))
    y = rng.integers(0, classes, n)
    X = centers[y] + rng.normal(0, 1.0, (n, 5))
    return X.astype(np.float32), y


def test_gradient_matches_finite_differences():
    """Autodiff loss gradient vs central finite differences."""
    X, y = _make_blobs(40, seed=1)
    clf = MLPClassifier(hidden_layer_sizes=(7,), activation="tanh",
                        alpha=1e-3)
    clf.classes_ = np.unique(y)
    clf._multiclass = False
    yb = (y == clf.classes_[1]).astype(np.float32)[:, None]

    rng = np.random.default_rng(0)
    params = {
        "w": [jnp.asarray(rng.normal(0, 0.5, (5, 7)).astype(np.float32)),
              jnp.asarray(rng.normal(0, 0.5, (7, 1)).astype(np.float32))],
        "b": [jnp.asarray(rng.normal(0, 0.1, 7).astype(np.float32)),
              jnp.asarray(rng.normal(0, 0.1, 1).astype(np.float32))],
    }
    xj, yj = jnp.asarray(X), jnp.asarray(yb)
    wm = jnp.ones(X.shape[0], jnp.float32)

    loss = lambda p: clf._loss(p, xj, yj, wm, X.shape[0])
    g = jax.grad(loss)(params)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    eps = 1e-3
    idxs = np.linspace(0, flat.size - 1, 17).astype(int)
    for i in idxs:
        e = jnp.zeros_like(flat).at[i].set(eps)
        fd = (float(loss(unravel(flat + e))) -
              float(loss(unravel(flat - e)))) / (2 * eps)
        assert fd == pytest.approx(float(gflat[i]), abs=2e-3), f"param {i}"


@pytest.mark.parametrize("solver", ["adam", "sgd", "lbfgs", "bfgs", "cg"])
def test_solvers_learn_blobs(solver):
    X, y = _make_blobs(600, seed=2)
    clf = MLPClassifier(hidden_layer_sizes=(20,), solver=solver,
                        learning_rate_init=1e-2 if solver in ("adam", "sgd")
                        else 1e-3,
                        max_iter=60, random_state=0)
    clf.fit(X, y)
    assert clf.score(X, y) > 0.9, f"{solver} score {clf.score(X, y)}"
    assert clf.loss_curve_[-1] < clf.loss_curve_[0]


@pytest.mark.parametrize("solver", ["lbfgs", "bfgs", "cg"])
def test_fullbatch_minimizers_solve_quadratic(solver):
    """lbfgs/bfgs/cg (gonum method registry parity,
    nn/base/optimizers.go:47-58) reach the exact minimum of a convex
    quadratic: f(x) = 0.5 (x-c)ᵀ A (x-c) with A ≻ 0."""
    from goctr_tpu.optim import fullbatch_minimize
    rng = np.random.default_rng(0)
    m = rng.normal(0, 1, (6, 6))
    a = jnp.asarray((m @ m.T + 6 * np.eye(6)).astype(np.float32))
    c = jnp.asarray(rng.normal(0, 2, 6).astype(np.float32))

    def loss(p):
        d = p["x"] - c
        return 0.5 * d @ a @ d

    x0 = {"x": jnp.zeros(6, jnp.float32)}
    sol, curve, n_iter = fullbatch_minimize(solver, loss, x0,
                                            max_iter=200, tol=1e-10)
    np.testing.assert_allclose(np.asarray(sol["x"]), np.asarray(c),
                               atol=1e-3)
    assert curve[-1] < 1e-5
    assert n_iter <= 200


def test_multiclass_softmax():
    X, y = _make_blobs(900, seed=3, classes=3)
    clf = MLPClassifier(hidden_layer_sizes=(30,), max_iter=60,
                        learning_rate_init=5e-3, random_state=0)
    clf.fit(X, y)
    assert clf.out_activation_ == "softmax"
    proba = clf.predict_proba(X[:10])
    assert proba.shape == (10, 3)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
    assert clf.score(X, y) > 0.85


def test_matches_sklearn_quality():
    """Same config as reference main.go:42-47 (hidden 100, relu, adam,
    alpha 1e-5): accuracy within a few points of sklearn's."""
    from sklearn.neural_network import MLPClassifier as SkMLP
    X, y = _make_blobs(800, seed=4)
    ours = MLPClassifier((100,), "relu", "adam", alpha=1e-5, max_iter=30,
                         random_state=0).fit(X, y)
    theirs = SkMLP((100,), activation="relu", solver="adam", alpha=1e-5,
                   max_iter=30, random_state=0).fit(X, y)
    assert abs(ours.score(X, y) - theirs.score(X, y)) < 0.05


def test_adaptive_lr_and_early_stop():
    X, y = _make_blobs(300, seed=5)
    clf = MLPClassifier((10,), solver="sgd", learning_rate="adaptive",
                        learning_rate_init=0.05, max_iter=500,
                        n_iter_no_change=5, random_state=0)
    clf.fit(X, y)
    assert clf.n_iter_ < 500   # stopped early after lr decays


def test_invscaling_schedule():
    X, y = _make_blobs(300, seed=6)
    clf = MLPClassifier((10,), solver="sgd", learning_rate="invscaling",
                        learning_rate_init=0.5, max_iter=20, random_state=0)
    clf.fit(X, y)
    assert clf.loss_curve_[-1] < clf.loss_curve_[0]


def test_batch_normalize_flag():
    x = jnp.asarray([[2.0, -8.0], [1.0, 4.0]])
    out = np.asarray(_maxabs_scale(x))
    np.testing.assert_allclose(out, [[1.0, -1.0], [0.5, 0.5]], rtol=1e-6)
    X, y = _make_blobs(300, seed=7)
    clf = MLPClassifier((10,), batch_normalize=True, max_iter=60,
                        learning_rate_init=1e-2,
                        random_state=0).fit(X * 100.0, y)
    assert clf.score(X * 100.0, y) > 0.8


def test_json_roundtrip():
    X, y = _make_blobs(300, seed=8)
    clf = MLPClassifier((12,), max_iter=20, random_state=0).fit(X, y)
    clf2 = MLPClassifier.from_json(clf.to_json())
    np.testing.assert_allclose(clf.predict_proba(X[:20]),
                               clf2.predict_proba(X[:20]), rtol=1e-6)
    assert clf2.score(X, y) == clf.score(X, y)


def test_single_class_raises():
    with pytest.raises(ValueError):
        MLPClassifier().fit(np.zeros((5, 2)), np.zeros(5))
