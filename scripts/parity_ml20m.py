"""ML-20M quality-parity run — reproduce the reference's headline numbers.

The reference's published results are three test-set scores on MovieLens-20M
(labelled "GAUC" in its README but computed as pooled ROC-AUC over the test
slice — /root/reference/README.md:17,25,33; the harness prints RocAuc32,
example/movielens/dinimpl_test.go:81, and no GAUC implementation exists in
its tree, SURVEY.md C18):

    MLP 0.771258    YouTube-DNN 0.760381    DIN 0.790542

protocol (dinimpl_test.go:20-86 with the ML-20M constants left in comments):
SampleCnt=14,400,000 train rows, testCount=5,610,000 eval rows ordered by
(timestamp, userId), by-user 80/20 SQL split (example/movielens/readme.md).

This script drives the SAME pipeline end-to-end on the goctr_tpu stack over
the ML-20M-statistics fixture (goctr_tpu/data/ml20m.py; the env has no
dataset downloads): PreTrain rating aggregates + ub-cache fill → item2vec
embedding pre-training → vectorized sample assembly → MLP / YouTube-DNN /
DIN training → pooled AUC (the reference-comparable number) AND true
per-user GAUC (parity+) on the test slice. Emits ONE JSON line.

The pipeline steps mirror recommend.Train exactly (pre_train → item2vec →
get_sample → fit, rcmd.py:332-357) but hoist the shared stages out of the
per-model loop — the reference runs three separate tests that each redo
identical assembly; assembling once is the same computation.

Usage:
  python scripts/parity_ml20m.py                 # full scale, TPU
  python scripts/parity_ml20m.py --scale=0.02 --cpu --epochs=8
  python scripts/parity_ml20m.py --set alpha=0.7 --set noise=0.9 --regen
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = {"mlp": 0.771258, "youtube": 0.760381, "din": 0.790542}


def _arg(name: str, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


def _knob_overrides():
    out = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--set" and i + 1 < len(argv):
            k, v = argv[i + 1].split("=", 1)
            out[k] = float(v)
        elif a.startswith("--set="):
            k, v = a.split("=", 2)[1:]
            out[k] = float(v)
    return out


def main() -> None:
    t_start = time.perf_counter()
    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from goctr_tpu.core.metrics import gauc_jit, roc_auc_jit
    from goctr_tpu.data.ml20m import SignalKnobs, generate_ml20m_fixture
    from goctr_tpu.data.movielens import MovielensRec
    from goctr_tpu.models.trainer import TrainerConfig
    from goctr_tpu.recommend import rcmd
    from goctr_tpu.recommend.rcmd import (
        Context, RankerFitter, Stage, _assemble_batch, _State, get_sample)

    scale = float(_arg("scale", "1.0"))
    verbose = "--quiet" not in sys.argv
    knobs_kw = _knob_overrides()
    ftypes = {f.name: f.type for f in dataclasses.fields(SignalKnobs)}
    knobs_kw = {k: (int(v) if ftypes.get(k) == "int" else v)
                for k, v in knobs_kw.items()}
    knobs = SignalKnobs(**knobs_kw) if knobs_kw else SignalKnobs()
    cache_dir = Path(_arg("cache_dir", "/root/ml20m_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    ktag = "_".join(f"{k}{v:g}" for k, v in sorted(knobs_kw.items()))
    db = Path(_arg("db", cache_dir / f"ml20m_s{scale:g}_{ktag}.db"))

    if not db.exists() or "--regen" in sys.argv:
        stats = generate_ml20m_fixture(
            db, scale=scale, knobs=knobs, verbose=verbose,
            oversample=float(_arg("oversample", "1.6" if scale < 0.2
                                  else "1.25")))
        if verbose:
            print("fixture:", json.dumps(stats), file=sys.stderr)

    sample_cnt = int(_arg("sample_cnt", int(14_400_000 * scale)))
    test_cnt = int(_arg("test_cnt", int(5_610_000 * scale)))
    rec = MovielensRec(str(db), sample_cnt=sample_cnt)
    ctx = Context(stage=Stage.TRAIN)
    state = _State()
    timings = {}

    def say(msg):
        if verbose:
            print(f"[parity +{time.perf_counter() - t_start:7.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    # assembled-matrix cache: the pre-stage (pre_train + item2vec +
    # assembly) is deterministic given (db, sample_cnt, test_cnt) — cache
    # it on disk so OOM-retry / multi-config runs skip ~18 min of rebuild
    xcache = Path(f"{db}.x_{sample_cnt}_{test_cnt}.npz")
    if xcache.exists() and "--no-xcache" not in sys.argv:
        from goctr_tpu.models.base import SampleInfo, TrainSample
        z = np.load(xcache)
        sample = TrainSample(x=z["x"], y=z["y"], info=SampleInfo(
            *[tuple(int(v) for v in r) for r in z["info"]]))
        x_test = z["x_test"].astype(np.float32)
        te_y, te_uid = z["te_y"], z["te_uid"]
        say(f"loaded cached matrices {sample.x.shape} / {x_test.shape}")
        run_models(sample, x_test, te_y, te_uid, timings, say, t_start,
                   scale, knobs)
        return

    # ---- PreTrain: rating aggregates + train ub-cache (feature.go:255-296)
    t0 = time.perf_counter()
    rec.pre_train(ctx)
    timings["pre_train_s"] = round(time.perf_counter() - t0, 1)
    say(f"pre_train done ({len(rec.m_rating_map)} movies)")

    # ---- item2vec pre-training (wordemb.go:9-32: SkipGram dim 16 window 5)
    t0 = time.perf_counter()
    from goctr_tpu.embedding.store import train_embedding
    state.item_embedding_map = train_embedding(
        rec.item_seq_generator(ctx), window=rcmd.ITEM_EMB_WINDOW,
        dim=rcmd.ITEM_EMB_DIM, iters=1)
    timings["item2vec_s"] = round(time.perf_counter() - t0, 1)
    say(f"item2vec done ({len(state.item_embedding_map)} embeddings)")

    # ---- sample assembly (GetSample rcmd.go:339-460, vectorized) --------
    t0 = time.perf_counter()
    sample = get_sample(rec, ctx, state)
    timings["assembly_s"] = round(time.perf_counter() - t0, 1)
    say(f"assembled {sample.rows} x {sample.x_cols} train matrix")

    # ---- test slice (dinimpl_test.go:52-61) -----------------------------
    t0 = time.perf_counter()
    sidecar = Path(str(db) + ".cols.npz")
    if sidecar.exists():
        with np.load(sidecar) as z:
            te_uid = z["test_uid"][:test_cnt]
            te_iid = z["test_iid"][:test_cnt]
            te_y = (z["test_rating"][:test_cnt] > 3.5).astype(np.float32)
            te_ts = z["test_ts"][:test_cnt]
    else:
        cur = rec.db.execute(
            "SELECT userId, movieId, rating, timestamp FROM ratings_test "
            "ORDER BY timestamp, userId ASC LIMIT ?", (test_cnt,))
        chunks = []
        while True:
            rows = cur.fetchmany(1_000_000)
            if not rows:
                break
            chunks.append(np.asarray(rows, np.float64))
        te = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        te_uid = te[:, 0].astype(np.int64)
        te_iid = te[:, 1].astype(np.int64)
        te_y = (te[:, 2] > 3.5).astype(np.float32)     # BinarizeLabel
        te_ts = te[:, 3].astype(np.int64)
        del chunks, te
    pctx = ctx.with_stage(Stage.PREDICT)
    if hasattr(rec, "pre_rank"):
        rec.pre_rank(pctx)
    x_test = _assemble_batch(pctx, state, rec, te_uid, te_iid, te_ts)
    timings["test_assembly_s"] = round(time.perf_counter() - t0, 1)
    say(f"assembled {x_test.shape[0]} x {x_test.shape[1]} test matrix "
        f"(pos rate {te_y.mean():.3f})")
    if "--no-xcache" not in sys.argv:
        np.savez(xcache, x=sample.x.astype(np.float16), y=sample.y,
                 info=np.asarray([sample.info.user_profile_range,
                                  sample.info.user_behavior_range,
                                  sample.info.item_feature_range,
                                  sample.info.ctx_feature_range]),
                 x_test=x_test.astype(np.float16), te_y=te_y, te_uid=te_uid)
        say("cached assembled matrices")

    run_models(sample, x_test, te_y, te_uid, timings, say, t_start, scale,
               knobs)


def run_models(sample, x_test, te_y, te_uid, timings, say, t_start, scale,
               knobs) -> None:
    import jax

    from goctr_tpu.core.metrics import gauc_jit, roc_auc_jit
    from goctr_tpu.models.trainer import TrainerConfig
    from goctr_tpu.recommend.rcmd import RankerFitter

    # --eval_sample=N scores a uniform N-row subsample of the test slice
    # (AUC/GAUC estimator noise at 1M rows is ±~0.001 — negligible against
    # the 0.75-0.80 parity band; full-slice per-call h2d through the axon
    # relay costs ~10x the training time)
    es = int(_arg("eval_sample", "0"))
    if es and es < x_test.shape[0]:
        sel = np.random.default_rng(0).permutation(x_test.shape[0])[:es]
        sel.sort()
        x_test, te_y, te_uid = x_test[sel], te_y[sel], te_uid[sel]

    # ---- train + eval the three reference models ------------------------
    import jax.numpy as jnp
    y_dev = jnp.asarray(te_y)
    uid_dev = jnp.asarray(te_uid)
    auc_fn = jax.jit(roc_auc_jit)
    gauc_fn = jax.jit(gauc_jit)

    models = _arg("models", "mlp,youtube,din").split(",")
    epochs = int(_arg("epochs", "30"))
    # per-model budgets are part of the reference protocol: its MLP trains
    # MaxIter=20 sweeps (main.go:48) while DIN/YT-DNN get epochs=200 with
    # earlyStop=20 (dinimpl_test.go:40-42)
    mlp_epochs = int(_arg("mlp_epochs", str(epochs)))
    bs = int(_arg("batch", "16384"))
    auc_out, gauc_out, rate_out = {}, {}, {}
    for name in models:
        cfg = TrainerConfig(
            batch_size=bs, epochs=mlp_epochs if name == "mlp" else epochs,
            early_stop=int(_arg("early_stop", "4")),
            lr=float(_arg("lr", "1e-3")),
            l2=1e-5 if name == "mlp" else 1e-4,   # main.go:42-47 / model.go:88
            store_dtype="float16", seed=int(_arg("seed", "0")))
        mkw = {}
        if name != "mlp" and _arg("seq_act", ""):
            # A/B knob: reference DIN/YT towers are sigmoid (din.go:307-315);
            # --seq_act=relu tries the modern activation on the same topology
            mkw["activation"] = _arg("seq_act", "")
        fitter = RankerFitter(name, trainer_config=cfg, use_bf16=True, **mkw)
        t0 = time.perf_counter()
        ranker = fitter.fit(sample)
        dt = time.perf_counter() - t0
        n_ep = len(ranker.epoch_times)
        rate = n_ep * sample.rows / max(sum(ranker.epoch_times), 1e-9)
        rate_out[name] = round(rate, 0)
        timings[f"train_{name}_s"] = round(dt, 1)
        say(f"{name}: {n_ep} epochs in {dt:.1f}s ({rate:,.0f} ex/s), "
            f"loss {ranker.loss_curve[-1]:.4f}")
        t0 = time.perf_counter()
        scores = ranker.predict(x_test, batch_size=int(_arg("pred_bs",
                                                            "131072")))
        s_dev = jnp.asarray(scores)
        auc_out[name] = round(float(auc_fn(s_dev, y_dev)), 6)
        gauc_out[name] = round(float(gauc_fn(s_dev, y_dev, uid_dev)), 6)
        timings[f"eval_{name}_s"] = round(time.perf_counter() - t0, 1)
        say(f"{name}: test AUC {auc_out[name]:.6f} "
            f"GAUC {gauc_out[name]:.6f} (ref {REF.get(name, float('nan'))})")

    print(json.dumps({
        "metric": "ml20m_quality_parity",
        "auc": auc_out,                  # reference-comparable pooled AUC
        "gauc": gauc_out,                # true per-user GAUC (parity+)
        "ref_auc": REF,
        "train_examples_per_s": rate_out,
        "scale": scale, "sample_cnt": sample.rows,
        "test_cnt": int(x_test.shape[0]),
        "timings_s": timings,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "knobs": dataclasses.asdict(knobs),
    }))


if __name__ == "__main__":
    main()
