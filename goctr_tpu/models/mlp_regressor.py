"""sklearn-style MLPRegressor (reference multilayer_perceptron.go:9-63:
same engine as the classifier with identity output + squared loss)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from goctr_tpu.models.mlp_classifier import FULLBATCH_SOLVERS, MLPClassifier


class MLPRegressor(MLPClassifier):

    def _loss(self, params, x, y, wmask, n_total):
        pred = self._forward(params, x)
        se = jnp.sum((pred - y) ** 2, axis=-1)
        data = 0.5 * jnp.sum(se * wmask) / jnp.maximum(jnp.sum(wmask), 1.0)
        l2 = sum(jnp.sum(w * w) for w in params["w"])
        return data + self.alpha * l2 / (2.0 * n_total)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "MLPRegressor":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        if y.ndim == 1:
            y = y[:, None]
        self._multiclass = False
        self.out_activation_ = "identity"
        self._n_outputs = y.shape[1]

        dims = (X.shape[1],) + self.hidden_layer_sizes + (y.shape[1],)
        key = jax.random.key(self.random_state)
        from goctr_tpu.models.mlp_classifier import _glorot_bounds
        params = {"w": [], "b": []}
        for i in range(len(dims) - 1):
            key, k1, k2 = jax.random.split(key, 3)
            bound = _glorot_bounds(dims[i], dims[i + 1], self.activation)
            params["w"].append(jax.random.uniform(
                k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound))
            params["b"].append(jax.random.uniform(
                k2, (dims[i + 1],), jnp.float32, -bound, bound))
        if self.solver in FULLBATCH_SOLVERS:
            self._fit_fullbatch(params, X, y)
        else:
            self._fit_stochastic(params, X, y, key)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(X, dtype=np.float32))
        out = np.asarray(self._forward(self._params(), x))
        return out[:, 0] if out.shape[1] == 1 else out

    def score(self, X, y) -> float:
        """R² (sklearn regressor convention)."""
        from goctr_tpu.core.metrics import r2_score
        pred = self.predict(X)
        return r2_score(np.asarray(y, dtype=np.float64).ravel(),
                        np.asarray(pred, dtype=np.float64).ravel())
