"""Activation/loss golden tests vs closed form (mirrors reference
model/activation_test.go + cost_test.go tier-1 strategy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from goctr_tpu.ops import (
    binary_cross_entropy, bce_with_logits, cosine_similarity,
    euclidean_distance, mse, prelu, rms,
)


def test_cosine_similarity_matches_numpy(rng):
    x = rng.random((4, 3, 8)).astype(np.float32)
    y = rng.random((4, 1, 8)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(x), jnp.asarray(y)))
    for b in range(4):
        for t in range(3):
            a, c = x[b, t], y[b, 0]
            want = a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-8)
            assert got[b, t] == pytest.approx(want, rel=1e-5)


def test_euclidean_distance(rng):
    x = rng.random((5, 8)).astype(np.float32)
    y = rng.random((5, 8)).astype(np.float32)
    got = np.asarray(euclidean_distance(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, np.linalg.norm(x - y, axis=-1), rtol=1e-5)


def test_prelu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    got = np.asarray(prelu(x, 0.1))
    np.testing.assert_allclose(got, [-0.2, 0.0, 3.0], atol=1e-7)


def test_bce_prob_vs_logits_agree(rng):
    logits = jnp.asarray(rng.normal(0, 2, 100).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, 100).astype(np.float32))
    probs = 1 / (1 + jnp.exp(-logits))
    a = float(binary_cross_entropy(probs, y, eps=0.0))
    b = float(bce_with_logits(logits, y))
    assert a == pytest.approx(b, rel=1e-4)


def test_mse_rms():
    p = jnp.asarray([1.0, 2.0]); t = jnp.asarray([3.0, 2.0])
    assert float(mse(p, t)) == pytest.approx(2.0)
    assert float(rms(p, t)) == pytest.approx(np.sqrt(2.0))
