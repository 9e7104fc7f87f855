"""End-to-end sparse training on the virtual mesh: the embedding table must
learn a planted id-level signal jointly with the dense tower."""
import numpy as np
import pytest

from goctr_tpu.core.meshes import MeshSpec, make_mesh
from goctr_tpu.core.metrics import roc_auc_score
from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.parallel.sparse_ctr import SparseCTR
from goctr_tpu.parallel.sparse_trainer import SparseSample, train_sparse


def _planted(n, vocab, t=5, seed=0):
    """label = 1 iff the candidate item's parity class matches the user's
    behavior-majority parity — only learnable through the embeddings."""
    rng = np.random.default_rng(seed)
    taste = rng.integers(0, 2, n)
    bids = np.where(rng.random((n, t)) < 0.85,
                    rng.integers(0, vocab // 2, (n, t)) * 2 + taste[:, None],
                    rng.integers(0, vocab, (n, t))).astype(np.int32)
    iids = (rng.integers(0, vocab // 2, n) * 2 +
            rng.integers(0, 2, n)).astype(np.int32)
    y = ((iids % 2) == taste).astype(np.float32)
    return SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=bids, item_ids=iids,
        ctx=rng.random((n, 2)).astype(np.float32), labels=y)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshSpec(data=4, model=2))


def test_sparse_end_to_end_learns(mesh):
    vocab = 200
    train = _planted(8000, vocab, seed=0)
    test = _planted(1000, vocab, seed=1)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(64, 32))
    # l2=0: weight decay on embedding rows kills the id-parity signal at
    # this scale (each row sees ~200 examples)
    cfg = TrainerConfig(batch_size=1024, epochs=10, early_stop=0, lr=1e-2,
                        l2=0.0)
    ranker = train_sparse(model, train, mesh, cfg)
    assert ranker.loss_curve[-1] < ranker.loss_curve[0] * 0.9
    auc = roc_auc_score(test.labels, ranker.predict(test))
    assert auc > 0.8, auc
    # table stayed sharded through training
    assert "model" in str(ranker.params["item_table"].sharding.spec)


def test_sparse_trainer_with_dedup_lookup(mesh):
    """End-to-end sharded training with the dedup'd unique-row exchange
    enabled must learn the same planted signal."""
    vocab = 200
    train = _planted(8000, vocab, seed=0)
    test = _planted(1000, vocab, seed=1)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(64, 32),
                      lookup_dedup_cap=256)   # 1024/4 shards × 5 ids fits
    cfg = TrainerConfig(batch_size=1024, epochs=10, early_stop=0, lr=1e-2,
                        l2=0.0)
    ranker = train_sparse(model, train, mesh, cfg)
    auc = roc_auc_score(test.labels, ranker.predict(test))
    assert auc > 0.8, auc


def test_sparse_predict_ragged(mesh):
    vocab = 500
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    train = _planted(1000, vocab, seed=2)
    ranker = train_sparse(model, train, mesh,
                          TrainerConfig(batch_size=256, epochs=1,
                                        early_stop=0))
    test = _planted(333, vocab, seed=3)   # not divisible by mesh/batch
    scores = ranker.predict(test, batch_size=128)
    assert scores.shape == (333,)
    assert np.all((scores >= 0) & (scores <= 1))
