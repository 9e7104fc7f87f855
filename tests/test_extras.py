"""MLPRegressor, legacy-style Neural net, console search, profiling timer."""
import io
import json

import numpy as np
import pytest

from goctr_tpu.core.profiling import StepTimer
from goctr_tpu.models.mlp_regressor import MLPRegressor
from goctr_tpu.models.neural import Neural, NeuralConfig


def test_mlp_regressor_fits_linear(rng):
    X = rng.random((400, 3)).astype(np.float32)
    y = (2 * X[:, 0] - 3 * X[:, 1] + 0.5).astype(np.float32)
    reg = MLPRegressor((32,), solver="adam", learning_rate_init=1e-2,
                       max_iter=80, random_state=0).fit(X, y)
    assert reg.score(X, y) > 0.95


def test_mlp_regressor_lbfgs(rng):
    X = rng.random((200, 2)).astype(np.float32)
    y = X[:, 0] ** 2 + X[:, 1]
    reg = MLPRegressor((16,), solver="lbfgs", max_iter=100,
                       random_state=0).fit(X, y)
    assert reg.score(X, y) > 0.9


def test_neural_xor():
    """Classic smoke test of the legacy engine (reference network_test.go)."""
    X = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], np.float32)
    Y = np.array([[0], [1], [1], [0]], np.float32)
    net = Neural(NeuralConfig(inputs=2, layout=(4, 1),
                              activation="sigmoid", weight_std=1.0), seed=3)
    curve = net.train(X, Y, lr=2.0, epochs=400, batch_size=4)
    assert curve[-1] < 0.1
    pred = net.predict(X).ravel()
    np.testing.assert_array_equal(pred.round(), Y.ravel())


def test_neural_marshal_roundtrip():
    net = Neural(NeuralConfig(inputs=3, layout=(5, 2),
                              activation=("tanh", "sigmoid")))
    x = np.random.default_rng(0).random((4, 3)).astype(np.float32)
    blob = net.marshal()
    net2 = Neural.unmarshal(blob)
    np.testing.assert_allclose(net.forward(x), net2.forward(x), rtol=1e-6)
    assert json.loads(blob)["config"]["layout"] == [5, 2]


def test_console_repl(monkeypatch, capsys, tmp_path):
    from goctr_tpu.embedding.console import repl
    from goctr_tpu.embedding.store import save_embedding_map
    p = tmp_path / "m.txt"
    save_embedding_map(p, {"apple": np.array([1.0, 0.0]),
                           "pear": np.array([0.9, 0.2]),
                           "car": np.array([0.0, 1.0])})
    inputs = iter(["apple", "zzz", ""])
    monkeypatch.setattr("builtins.input", lambda *_: next(inputs))
    repl(str(p), k=2)
    out = capsys.readouterr().out
    assert "pear" in out and "not in vocabulary" in out


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3 and s["total_s"] >= 0
