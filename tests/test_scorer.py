"""TPU-first serving path (serve/scorer.py): the device-resident scorer
must reproduce the trainer's predict scores exactly, across table layouts,
and the micro-batcher must coalesce concurrent requests correctly."""
import numpy as np
import pytest

from goctr_tpu.models.trainer import TrainerConfig
from goctr_tpu.parallel.scanned import TableOptConfig, train_sparse_scanned
from goctr_tpu.parallel.sparse_ctr import SparseCTR
from goctr_tpu.parallel.sparse_trainer import SparseSample
from goctr_tpu.serve.scorer import DeviceScorer, MicroBatcher


def _train(vocab=120, grouped_resident=False, monkeypatch=None):
    rng = np.random.default_rng(0)
    n = 1500
    sample = SparseSample(
        user_profile=rng.random((n, 4)).astype(np.float32),
        behavior_ids=rng.integers(-1, vocab, (n, 5)).astype(np.int32),
        item_ids=rng.integers(0, vocab, n).astype(np.int32),
        ctx=rng.random((n, 2)).astype(np.float32),
        labels=(rng.random(n) > 0.5).astype(np.float32))
    model = SparseCTR(item_vocab=vocab, emb_dim=8, u_profile_dim=4,
                      ctx_dim=2, behavior_len=5, hidden=(16,))
    if grouped_resident:
        import goctr_tpu.parallel.scanned as sc
        monkeypatch.setattr(sc, "GROUPED_RESIDENT_MIN_V", 50)
    r = train_sparse_scanned(
        model, sample, TrainerConfig(batch_size=512, epochs=2, early_stop=0,
                                     seed=1, shuffle=False),
        TableOptConfig(kind="adagrad", lr=0.3, update_mode="fused"))
    return r, sample


def _request_sample(profile, bids, ctx, cands):
    k = len(cands)
    return SparseSample(
        user_profile=np.tile(profile, (k, 1)),
        behavior_ids=np.tile(bids, (k, 1)),
        item_ids=np.asarray(cands, np.int32),
        ctx=np.tile(ctx, (k, 1)),
        labels=np.zeros(k, np.float32))


@pytest.mark.parametrize("grouped", [False, True])
def test_device_scorer_matches_predict(grouped, monkeypatch):
    r, sample = _train(grouped_resident=grouped, monkeypatch=monkeypatch)
    assert (r.packed_group > 1) == grouped
    scorer = DeviceScorer.from_scanned(r)
    rng = np.random.default_rng(3)
    prof = sample.user_profile[7]
    bids = sample.behavior_ids[7]
    ctx = sample.ctx[7]
    cands = rng.integers(0, 120, 37).astype(np.int32)
    got = scorer.score(prof, bids, ctx, cands)
    want = r.predict(_request_sample(prof, bids, ctx, cands))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_device_scorer_batch_and_ragged():
    r, sample = _train()
    scorer = DeviceScorer.from_scanned(r)
    rng = np.random.default_rng(5)
    rows = [1, 2, 3]
    cands = [rng.integers(0, 120, k).astype(np.int32)
             for k in (5, 130, 513)]     # crosses both bucket boundaries
    outs = scorer.score_batch(
        sample.user_profile[rows], sample.behavior_ids[rows],
        sample.ctx[rows], cands)
    assert [len(o) for o in outs] == [5, 130, 513]
    for row, c, o in zip(rows, cands, outs):
        want = r.predict(_request_sample(
            sample.user_profile[row], sample.behavior_ids[row],
            sample.ctx[row], c))
        np.testing.assert_allclose(o, want, rtol=2e-5, atol=1e-6)


def test_micro_batcher_concurrent():
    import threading

    r, sample = _train()
    scorer = DeviceScorer.from_scanned(r)
    mb = MicroBatcher(scorer, max_requests=8, max_wait_s=0.05)
    rng = np.random.default_rng(7)
    rows = list(range(8))
    cands = [rng.integers(0, 120, 21).astype(np.int32) for _ in rows]
    outs = [None] * len(rows)

    def work(i):
        outs[i] = mb.submit(sample.user_profile[rows[i]],
                            sample.behavior_ids[rows[i]],
                            sample.ctx[rows[i]], cands[i])

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        want = r.predict(_request_sample(
            sample.user_profile[rows[i]], sample.behavior_ids[rows[i]],
            sample.ctx[rows[i]], cands[i]))
        np.testing.assert_allclose(outs[i], want, rtol=2e-5, atol=1e-6)


def test_http_rank_direct_path():
    """RecApiServer must route to rank_direct when the predictor exposes
    it (the TPU-first serving wiring)."""
    import json
    import urllib.request

    from goctr_tpu.serve.api import RecApiServer
    from goctr_tpu.serve.scorer import SparseRankPredictor

    r, sample = _train()
    scorer = DeviceScorer.from_scanned(r)
    pred = SparseRankPredictor(
        scorer=scorer,
        user_profiles=sample.user_profile[:50],
        user_behaviors=sample.behavior_ids[:50],
        default_ctx=sample.ctx[0])
    srv = RecApiServer(pred, port=0).start(background=True)
    try:
        body = json.dumps({"userId": 3,
                           "itemIdList": [1, 2, 3, 4, 5]}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/recommend", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        lst = out["itemScoreList"]
        assert [e["itemId"] for e in lst] == [1, 2, 3, 4, 5]
        assert all(0.0 <= e["score"] <= 1.0 for e in lst)
        want = r.predict(_request_sample(
            sample.user_profile[3], sample.behavior_ids[3], sample.ctx[0],
            np.arange(1, 6, dtype=np.int32)))
        np.testing.assert_allclose([e["score"] for e in lst], want,
                                   rtol=2e-4, atol=1e-5)
    finally:
        srv.stop()
