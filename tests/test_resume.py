"""Mid-training resume: save at epoch k with optimizer state, restore, and
continue — the aux capability the reference lacks (SURVEY.md §5)."""
import numpy as np

from goctr_tpu.models import MLPTower, SampleInfo, TrainSample, train_ranker
from goctr_tpu.models.io import load_checkpoint, save_checkpoint
from goctr_tpu.models.trainer import TrainerConfig

W = 12
INFO = SampleInfo((0, W), (W, W), (W, W), (W, W))


def _sample(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((n, W)).astype(np.float32)
    y = (x[:, 0] + x[:, 1] > 1.0).astype(np.float32)
    return TrainSample(x=x, y=y, info=INFO)


def test_resume_continues_from_opt_state(tmp_path):
    sample = _sample()
    cfg_a = TrainerConfig(batch_size=256, epochs=5, early_stop=0, lr=5e-3)
    r1 = train_ranker(MLPTower(in_dim=W, hidden=(16,)), sample, cfg_a)
    assert r1.opt_state is not None
    save_checkpoint(tmp_path / "ck", r1, trainer_config=cfg_a)

    restored = load_checkpoint(tmp_path / "ck")
    assert restored.opt_state is not None
    assert restored.loss_curve == r1.loss_curve

    cfg_b = TrainerConfig(batch_size=256, epochs=5, early_stop=0, lr=5e-3)
    r2 = train_ranker(restored.model, sample, cfg_b, resume_from=restored)
    assert len(r2.loss_curve) == 10
    # resumed training continues to improve from where it left off
    assert r2.loss_curve[-1] <= r1.loss_curve[-1] + 1e-3


def test_resume_matches_uninterrupted_shape(tmp_path):
    """10 straight epochs vs 5+5 resumed reach similar loss (adam moments
    carried across the boundary — would diverge more if state were lost)."""
    sample = _sample(seed=1)
    cfg10 = TrainerConfig(batch_size=256, epochs=10, early_stop=0, lr=5e-3,
                          shuffle=False)
    straight = train_ranker(MLPTower(in_dim=W, hidden=(16,)), sample, cfg10)

    cfg5 = TrainerConfig(batch_size=256, epochs=5, early_stop=0, lr=5e-3,
                         shuffle=False)
    half = train_ranker(MLPTower(in_dim=W, hidden=(16,)), sample, cfg5)
    resumed = train_ranker(half.model, sample, cfg5, resume_from=half)
    assert abs(resumed.loss_curve[-1] - straight.loss_curve[-1]) < 0.02


def test_periodic_checkpointing(tmp_path):
    sample = _sample(1000, seed=5)
    cfg = TrainerConfig(batch_size=256, epochs=6, early_stop=0,
                        checkpoint_every=2, checkpoint_dir=str(tmp_path / "auto"))
    r = train_ranker(MLPTower(in_dim=W, hidden=(8,)), sample, cfg)
    from goctr_tpu.models.io import load_checkpoint
    snap = load_checkpoint(tmp_path / "auto")
    # last periodic snapshot at epoch 6 == final state
    assert len(snap.loss_curve) == 6
    np.testing.assert_allclose(snap.predict(sample.x[:50]),
                               r.predict(sample.x[:50]), rtol=1e-5)
