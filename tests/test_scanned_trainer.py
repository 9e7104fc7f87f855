"""Scanned single-device SparseCTR trainer: one dispatch per epoch, sparse
scatter-add table updates (no dense [V, D] gradient), adagrad/sgd row-wise
optimizers. Must learn the same planted id-level signal as the sharded
trainer (tests/test_sparse_trainer.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from goctr_tpu.core.metrics import roc_auc_score
from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.parallel.scanned import (
    TableOptConfig, model_flops_per_example, train_sparse_scanned,
)
from goctr_tpu.parallel.sparse_ctr import SparseCTR
from goctr_tpu.parallel.sparse_trainer import SparseSample


def _planted(n, vocab, t=5, seed=0):
    """Same rule as test_sparse_trainer._planted: label = item-parity ==
    behavior-majority parity, learnable only through embeddings."""
    rng = np.random.default_rng(seed)
    taste = rng.integers(0, 2, n)
    bids = np.where(rng.random((n, t)) < 0.85,
                    rng.integers(0, vocab // 2, (n, t)) * 2 + taste[:, None],
                    rng.integers(0, vocab, (n, t))).astype(np.int32)
    # pad a few behaviors to exercise the -1 mask path
    bids[rng.random((n, t)) < 0.1] = -1
    iids = (rng.integers(0, vocab // 2, n) * 2 +
            rng.integers(0, 2, n)).astype(np.int32)
    y = ((iids % 2) == taste).astype(np.float32)
    return SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=bids, item_ids=iids,
        ctx=rng.random((n, 2)).astype(np.float32), labels=y)


@pytest.mark.parametrize("kind,mode", [
    ("adagrad", "dedup"), ("adagrad", "sorted"), ("adagrad", "plain"),
    ("adagrad", "fused"), ("adagrad", "runfused"), ("adagrad", "fused2"),
    ("sgd", "dedup"), ("sgd", "plain"), ("sgd", "fused"),
    ("sgd", "runfused"), ("sgd", "fused2"),
])
def test_scanned_learns_planted_signal(kind, mode):
    vocab = 200
    train = _planted(8000, vocab, seed=0)
    test = _planted(1000, vocab, seed=1)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(64, 32))
    cfg = TrainerConfig(batch_size=1024, epochs=10, early_stop=0, lr=1e-2,
                        l2=0.0)
    lr = 0.3 if kind == "adagrad" else 30.0
    r = train_sparse_scanned(model, train, cfg,
                             TableOptConfig(kind=kind, lr=lr,
                                            update_mode=mode))
    assert r.loss_curve[-1] < r.loss_curve[0] * 0.9
    auc = roc_auc_score(test.labels, r.predict(test))
    assert auc > 0.8, f"{kind}/{mode} AUC {auc}"


def test_sgd_update_modes_are_numerically_identical():
    """SGD is linear in the gradient, so plain / sorted / dedup scatter
    strategies must produce bit-comparable tables (same sums, fp order
    aside)."""
    vocab = 100
    train = _planted(2000, vocab, seed=7)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=3)
    tables = {}
    for mode in ("plain", "sorted", "dedup"):
        r = train_sparse_scanned(model, train, cfg,
                                 TableOptConfig(kind="sgd", lr=5.0,
                                                update_mode=mode))
        # dedup mode carries junk pad rows past the vocab
        tables[mode] = np.asarray(r.table[:vocab])
    np.testing.assert_allclose(tables["sorted"], tables["plain"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(tables["dedup"], tables["plain"],
                               rtol=1e-5, atol=1e-7)


def test_fused_matches_dedup_adagrad_exactly():
    """fused (packed-row Pallas optimizer; jnp fallback on CPU) and dedup
    are both exact row-wise adagrad over segment-summed duplicates, so
    tables AND accumulators must agree."""
    vocab = 100
    train = _planted(2000, vocab, seed=11)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=3)
    out = {}
    for mode in ("dedup", "fused", "runfused", "fused2"):
        r = train_sparse_scanned(model, train, cfg,
                                 TableOptConfig(kind="adagrad", lr=0.3,
                                                update_mode=mode))
        out[mode] = (np.asarray(r.table[:vocab]), np.asarray(r.acc[:vocab]),
                     r.loss_curve)
    for mode in ("fused", "runfused", "fused2"):
        # fused2 recovers run sums as diffs of cumsum rows, and grouped
        # fused (D=8 → G=14 rows/line) adds a line-level run-sum pass —
        # both cost a few ulps of fp reordering vs direct segment sums
        tol = dict(rtol=1e-4, atol=1e-6) if mode in ("fused2", "fused") \
            else dict(rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(out[mode][0], out["dedup"][0], **tol)
        np.testing.assert_allclose(out[mode][1], out["dedup"][1], **tol)
        np.testing.assert_allclose(out[mode][2], out["dedup"][2], rtol=1e-4)


def test_scanned_bf16_and_ragged_predict():
    vocab = 300
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,),
                      compute_dtype=jnp.bfloat16)
    train = _planted(1000, vocab, seed=2)
    r = train_sparse_scanned(model, train,
                             TrainerConfig(batch_size=256, epochs=2,
                                           early_stop=0))
    # master weights stay f32
    assert r.table.dtype == jnp.float32
    assert all(w.dtype == jnp.float32 for w in r.dense_params["mlp"])
    test = _planted(333, vocab, seed=3)   # non-divisible: pads last bucket
    scores = r.predict(test, batch_size=128)
    assert scores.shape == (333,)
    assert np.all((scores >= 0) & (scores <= 1))
    assert np.all(np.isfinite(scores))


def test_scanned_padded_tail_rows_ignored():
    """n not divisible by batch: padded rows carry weight 0 and must not
    corrupt the table (their ids are real row 0 after clamping)."""
    vocab = 100
    train = _planted(1000, vocab, seed=4)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    r = train_sparse_scanned(model, train,
                             TrainerConfig(batch_size=300, epochs=1,
                                           early_stop=0, shuffle=False))
    assert np.all(np.isfinite(np.asarray(r.table)))
    assert len(r.loss_curve) == 1


def test_model_flops_per_example_counts_tower():
    model = SparseCTR(item_vocab=10, emb_dim=16, u_profile_dim=8, ctx_dim=4,
                      behavior_len=10, hidden=(200, 80))
    f = model_flops_per_example(model, T=10)
    concat = 8 + 2 * 16 + 4
    macs = concat * 200 + 200 * 80 + 80 * 1
    assert f == pytest.approx(6 * macs + 3 * 4 * 10 * 16)


def test_scanned_checkpoint_resume(tmp_path):
    """Save → load → resume: predictions restore exactly, and resumed
    training continues from the saved optimizer/accumulator state."""
    from goctr_tpu.parallel.scanned import (
        load_scanned_checkpoint, save_scanned_checkpoint,
    )

    vocab = 150
    train = _planted(3000, vocab, seed=6)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=3, early_stop=0, seed=2)
    r1 = train_sparse_scanned(model, train, cfg,
                              TableOptConfig(kind="adagrad", lr=0.3))
    save_scanned_checkpoint(tmp_path / "ckpt", r1, trainer_config=cfg)
    r2 = load_scanned_checkpoint(tmp_path / "ckpt")
    assert r2.model.item_vocab == vocab and r2.model.hidden == (16,)
    test = _planted(200, vocab, seed=7)
    np.testing.assert_allclose(r1.predict(test), r2.predict(test),
                               rtol=1e-6, atol=1e-7)
    assert r2.opt_state is not None and r2.acc is not None
    r3 = train_sparse_scanned(model, train, cfg,
                              TableOptConfig(kind="adagrad", lr=0.3),
                              resume_from=r2)
    assert len(r3.loss_curve) == 6           # 3 saved + 3 new
    assert r3.loss_curve[-1] <= r1.loss_curve[-1] + 0.05


def test_sorted_gather_matches_direct():
    """sorted_gather is a pure access-order optimization: same numbers."""
    vocab = 120
    train = _planted(2000, vocab, seed=8)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=5)
    r1 = train_sparse_scanned(model, train, cfg,
                              TableOptConfig(kind="sgd", lr=5.0,
                                             update_mode="plain"))
    r2 = train_sparse_scanned(model, train, cfg,
                              TableOptConfig(kind="sgd", lr=5.0,
                                             update_mode="plain",
                                             sorted_gather=True))
    np.testing.assert_allclose(np.asarray(r2.table), np.asarray(r1.table),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(r2.loss_curve, r1.loss_curve, rtol=1e-5)


def test_fused_compact_cap_matches_uncompacted():
    """compact_cap (rank-sort compaction of the fused front-end) must be
    trajectory-identical to the uncompacted pipeline when the cap covers
    every batch's uniques, and must COUNT dropped rows when undersized."""
    vocab = 100
    train = _planted(2000, vocab, seed=11)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=3)
    base = train_sparse_scanned(model, train, cfg,
                                TableOptConfig(kind="adagrad", lr=0.3,
                                               update_mode="fused"))
    comp = train_sparse_scanned(
        model, train, cfg,
        TableOptConfig(kind="adagrad", lr=0.3, update_mode="fused",
                       compact_cap=1024))   # vocab 100 << 1024: exact
    assert comp.update_overflow_max == 0
    np.testing.assert_allclose(comp.loss_curve, base.loss_curve, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(comp.table[:vocab]),
                               np.asarray(base.table[:vocab]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comp.acc[:vocab]),
                               np.asarray(base.acc[:vocab]),
                               rtol=1e-4, atol=1e-6)


def test_fused_compact_cap_overflow_detected():
    """An undersized compact_cap must report dropped uniques, never
    silently lose them."""
    vocab = 5000
    rng = np.random.default_rng(0)
    n = 2048
    train = SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=rng.permutation(vocab)[:n].reshape(n, 1).astype(
            np.int32),
        item_ids=rng.permutation(vocab)[:n].astype(np.int32),
        ctx=rng.random((n, 2)).astype(np.float32),
        labels=(rng.random(n) > 0.5).astype(np.float32))
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=1, hidden=(16,))
    cfg = TrainerConfig(batch_size=n, epochs=1, early_stop=0, seed=0)
    r = train_sparse_scanned(model, train, cfg,
                             TableOptConfig(kind="adagrad", lr=0.1,
                                            update_mode="fused",
                                            compact_cap=1024))
    assert r.update_overflow_max > 0    # 4096 distinct ids >> cap 1024


def test_grouped_resident_predict_and_checkpoint(monkeypatch, tmp_path):
    """Very large grouped vocabs keep the [L, 128] line layout end-to-end
    (a [V, D] device array lane-pads D→128; 51GB at 100M×16). Predict must
    gather grouped lines and checkpoints must export the standard [V, D]
    layout via the host unpack."""
    from goctr_tpu.parallel import scanned as sc

    monkeypatch.setattr(sc, "GROUPED_RESIDENT_MIN_V", 50)
    vocab = 100
    train = _planted(2000, vocab, seed=11)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=3)
    r = sc.train_sparse_scanned(model, train, cfg,
                                TableOptConfig(kind="adagrad", lr=0.3,
                                               update_mode="fused"))
    assert r.packed_group > 1
    assert r.table.shape[1] == 128          # line layout retained
    scores = r.predict(train)
    assert np.isfinite(scores).all() and scores.shape == (2000,)

    sc.save_scanned_checkpoint(tmp_path / "ck", r, cfg)
    loaded = sc.load_scanned_checkpoint(tmp_path / "ck")
    assert loaded.table.shape == (vocab, 8)  # standard layout exported
    from goctr_tpu.ops.pallas.row_optimizer import unpack_table_grouped_np
    want_w, _ = unpack_table_grouped_np(np.asarray(r.table), vocab, 8)
    np.testing.assert_allclose(np.asarray(loaded.table), want_w, rtol=1e-6)
    scores2 = loaded.predict(train)
    np.testing.assert_allclose(scores, scores2, rtol=2e-3, atol=2e-4)


def test_grouped_resident_in_memory_resume(monkeypatch):
    """In-memory resume of a grouped-resident run (packed_group > 1) must
    reuse the [L, 128] line layout instead of feeding it to
    pack_table_grouped as [V, D] weights (ADVICE r4)."""
    from goctr_tpu.parallel import scanned as sc

    monkeypatch.setattr(sc, "GROUPED_RESIDENT_MIN_V", 50)
    vocab = 100
    train = _planted(2000, vocab, seed=11)
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                        shuffle=False, seed=3)
    topt = TableOptConfig(kind="adagrad", lr=0.3, update_mode="fused")
    r = sc.train_sparse_scanned(model, train, cfg, topt)
    assert r.packed_group > 1
    n_prev, last_prev = len(r.loss_curve), r.loss_curve[-1]

    # grouped→grouped resume reuses the line layout zero-copy (donation
    # consumes resume_from — chain the resumes, never reuse a consumed one)
    r2 = sc.train_sparse_scanned(model, train, cfg, topt, resume_from=r)
    assert r2.packed_group == r.packed_group
    assert len(r2.loss_curve) == n_prev + 2
    assert r2.loss_curve[-1] <= last_prev + 1e-6
    scores = r2.predict(train)
    assert np.isfinite(scores).all()

    # resuming into a non-grouped mode unpacks the lines first (dedup mode
    # keeps its junk pad rows past the vocab)
    r3 = sc.train_sparse_scanned(
        model, train, TrainerConfig(batch_size=512, epochs=1, early_stop=0,
                                    shuffle=False, seed=4),
        TableOptConfig(kind="adagrad", lr=0.3, update_mode="dedup"),
        resume_from=r2)
    assert r3.packed_group == 1 and r3.table.shape[1] == 8
    assert r3.table.shape[0] >= vocab


def test_scanned_trainer_compact_kernel_parity():
    """compact_impl='kernel' (Pallas block-compaction) must reproduce the
    XLA rank-sort trajectory end-to-end (tolerances: block-local vs
    global f32 cumsum rounding only)."""
    rng = np.random.default_rng(0)
    n, vocab = 3000, 400
    train = SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=rng.integers(-1, vocab, (n, 5)).astype(np.int32),
        item_ids=rng.integers(0, vocab, n).astype(np.int32),
        ctx=rng.random((n, 2)).astype(np.float32),
        labels=(rng.random(n) > 0.5).astype(np.float32))
    model = SparseCTR(item_vocab=vocab, emb_dim=64, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    cfg = TrainerConfig(batch_size=1024, epochs=3, early_stop=0, seed=0,
                        shuffle=False)
    out = {}
    for impl in ("xla", "kernel"):
        out[impl] = train_sparse_scanned(
            model, train, cfg,
            TableOptConfig(kind="adagrad", lr=0.3, update_mode="fused",
                           compact_cap=2048, compact_impl=impl))
    np.testing.assert_allclose(out["kernel"].loss_curve,
                               out["xla"].loss_curve, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["kernel"].table),
                               np.asarray(out["xla"].table),
                               rtol=1e-4, atol=1e-5)
