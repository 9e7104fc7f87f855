"""Checkpoint round-trip tests (mirrors reference JSON round-trip checks in
model/model_test.go:95-147)."""
import jax
import numpy as np

from goctr_tpu.models import DIN, SampleInfo, TrainSample, YoutubeDNN, train_ranker
from goctr_tpu.models.io import (
    din_from_json, din_to_json, load_checkpoint, save_checkpoint,
    youtube_dnn_from_json, youtube_dnn_to_json,
)
from goctr_tpu.models.trainer import TrainerConfig

U, T, D, I, C = 4, 3, 6, 6, 2
W = U + T * D + I + C
INFO = SampleInfo((0, U), (U, U + T * D), (U + T * D, U + T * D + I),
                  (U + T * D + I, W))


def _sample(n=512, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, W)).astype(np.float32)
    y = (rng.random(n) > 0.5).astype(np.float32)
    return TrainSample(x=x, y=y, info=INFO)


def test_din_reference_json_roundtrip():
    model = DIN(U, T, D, I, C, use_bias=False)
    params = model.init_params(jax.random.key(0))
    blob = din_to_json(model, params)
    model2, params2 = din_from_json(blob)
    x = _sample(64, 1).x
    import jax.numpy as jnp
    from goctr_tpu.models.base import split_blocks
    blocks = split_blocks(jnp.asarray(x), INFO, T)
    out1 = np.asarray(model.apply(params, blocks))
    out2 = np.asarray(model2.apply(params2, blocks))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_youtube_dnn_reference_json_roundtrip():
    model = YoutubeDNN(U, T, D, I, C, use_bias=False)
    params = model.init_params(jax.random.key(0))
    blob = youtube_dnn_to_json(model, params)
    model2, params2 = youtube_dnn_from_json(blob)
    assert model2.behavior_len == T
    np.testing.assert_allclose(np.asarray(params["mlp"][0]),
                               np.asarray(params2["mlp"][0]), rtol=1e-6)


def test_full_checkpoint_roundtrip(tmp_path):
    sample = _sample()
    ranker = train_ranker(DIN(U, T, D, I, C), sample,
                          TrainerConfig(epochs=2, early_stop=0, batch_size=128))
    save_checkpoint(tmp_path / "ckpt", ranker)
    restored = load_checkpoint(tmp_path / "ckpt")
    x = _sample(200, 2).x
    np.testing.assert_allclose(ranker.predict(x), restored.predict(x),
                               rtol=1e-5)
    assert restored.loss_curve == ranker.loss_curve
