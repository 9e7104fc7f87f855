"""Out-of-core streaming trainer: equivalence with the resident trainer on
one chunk, learning across multiple chunks."""
import numpy as np

from goctr_tpu.models import MLPTower, SampleInfo, TrainSample, train_ranker
from goctr_tpu.models.streaming import train_ranker_streaming
from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.core.metrics import roc_auc_score

W = 10
INFO = SampleInfo((0, W), (W, W), (W, W), (W, W))


def _sample(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, W)).astype(np.float32)
    y = (x[:, 0] - x[:, 1] + 0.2 * rng.standard_normal(n) > 0).astype(
        np.float32)
    return TrainSample(x=x, y=y, info=INFO)


def test_single_chunk_matches_resident():
    sample = _sample(2048)
    cfg = TrainerConfig(batch_size=256, epochs=4, early_stop=0,
                        shuffle=False, lr=5e-3)
    a = train_ranker(MLPTower(in_dim=W, hidden=(8,)), sample, cfg)
    b = train_ranker_streaming(MLPTower(in_dim=W, hidden=(8,)), sample, cfg,
                               chunk_rows=2048)
    # same data order, same seeds → same trajectory
    np.testing.assert_allclose(a.loss_curve, b.loss_curve, rtol=1e-4)


def test_multi_chunk_learns():
    train = _sample(10000, seed=1)
    test = _sample(1000, seed=2)
    cfg = TrainerConfig(batch_size=256, epochs=6, early_stop=0, lr=5e-3)
    r = train_ranker_streaming(MLPTower(in_dim=W, hidden=(16,)), train, cfg,
                               chunk_rows=2048)   # 5 chunks
    auc = roc_auc_score(test.y, r.predict(test.x))
    assert auc > 0.9, auc
    assert r.loss_curve[-1] < r.loss_curve[0]


def test_ragged_final_chunk():
    train = _sample(2500, seed=3)   # 2 chunks: 2048 + 452 padded
    cfg = TrainerConfig(batch_size=128, epochs=2, early_stop=0)
    r = train_ranker_streaming(MLPTower(in_dim=W, hidden=(8,)), train, cfg,
                               chunk_rows=2048)
    assert len(r.loss_curve) == 2
    assert np.isfinite(r.loss_curve).all()
