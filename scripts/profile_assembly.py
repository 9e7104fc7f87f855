"""Host sample-assembly profiler (VERDICT r4 next-#9).

The ML-20M parity run spends ~8 min assembling the 14.4M × 281 train
matrix on this 2-vCPU host (~30k rows/s) — >99% of a cold parity run once
the TPU trains at 3.7M ex/s. This script stage-times the assembly
pipeline on a fixture db so the wall has a breakdown (the reference's
analogous wall is its 16-goroutine assembly fan-out, rcmd.go:375-397).

  python scripts/profile_assembly.py --db=/root/ml20m_cache/<db> [--cnt=N]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _arg(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


def main():
    from goctr_tpu.data.movielens import MovielensRec
    from goctr_tpu.recommend import rcmd
    from goctr_tpu.recommend.rcmd import (
        Context, Stage, _State, _feature_matrix, _fetch_features_unique)

    db = _arg("db", None)
    if db is None:
        raise SystemExit("--db=<fixture.db> required")
    cnt = int(_arg("cnt", "1440000"))
    rec = MovielensRec(db, sample_cnt=cnt)
    ctx = Context(stage=Stage.TRAIN)
    state = _State()
    stages = {}

    def clock(name):
        class C:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *a):
                stages[name] = round(time.perf_counter() - self.t, 2)
                print(f"  {name:24s} {stages[name]:8.2f}s", flush=True)
        return C()

    with clock("pre_train (SQL aggregates)"):
        rec.pre_train(ctx)
    if "--fake-emb" in sys.argv:
        # CPU-only profiling: random embeddings instead of the TPU
        # item2vec stage (assembly cost is what's being measured)
        with clock("fake emb map"):
            from goctr_tpu.embedding.store import EmbeddingMap
            mids = [r[0] for r in rec.db.execute(
                "SELECT movieId FROM movies")]
            rngf = np.random.default_rng(0)
            state.item_embedding_map = EmbeddingMap(
                {str(m): rngf.standard_normal(
                    rcmd.ITEM_EMB_DIM).astype(np.float32) for m in mids})
    else:
        with clock("item2vec (1 iter)"):
            from goctr_tpu.embedding.store import train_embedding
            state.item_embedding_map = train_embedding(
                rec.item_seq_generator(ctx), window=rcmd.ITEM_EMB_WINDOW,
                dim=rcmd.ITEM_EMB_DIM, iters=1)
    with clock("sample_generator (SQL read)"):
        uid, iid, y, ts = rec.sample_generator_arrays(ctx)
        uid = np.asarray(uid, np.int64)
        iid = np.asarray(iid, np.int64)
        ts = np.asarray(ts, np.int64)
    n = uid.size
    with clock("fetch user features"):
        users = _fetch_features_unique(ctx, state, rec,
                                       np.unique(uid).tolist(), "user")
    with clock("fetch item features"):
        items = _fetch_features_unique(ctx, state, rec,
                                       np.unique(iid).tolist(), "item")
    with clock("feature matrices + idx"):
        u_mat, u_rows = _feature_matrix(users)
        i_mat, i_rows = _feature_matrix(items)
        u_idx = u_rows(uid)
        i_idx = i_rows(iid)
    emb_map = state.item_embedding_map
    with clock("emb map as_arrays"):
        words, emb_mat = emb_map.as_arrays()
        emb_mat = np.concatenate(
            [np.zeros((1, emb_mat.shape[1]), np.float32), emb_mat])
        int_words = np.asarray([int(w) for w in words], np.int64)
        order = np.argsort(int_words)
        iw_sorted = int_words[order]

        def emb_rows_of(q):
            q = np.asarray(q, np.int64)
            pos = np.searchsorted(iw_sorted, q).clip(0, iw_sorted.size - 1)
            return np.where(iw_sorted[pos] == q, order[pos] + 1, 0)
    with clock("item emb gather"):
        item_emb = emb_mat[emb_rows_of(iid)]
    with clock("behaviors bulk_get"):
        beh_items = rec.get_user_behaviors_bulk(ctx, uid, ts,
                                                rcmd.USER_BEHAVIOR_LEN)
    with clock("behavior emb idx"):
        beh_idx = np.where(beh_items >= 0,
                           emb_rows_of(beh_items.clip(0)), 0)
    with clock("direct assembly (r5 C paths)"):
        from goctr_tpu.native.hashing import (
            gather_emb_rows_into, gather_rows_into)
        u_w, i_w = u_mat.shape[1], i_mat.shape[1]
        ub0 = u_w
        ub1 = ub0 + rcmd.ITEM_EMB_DIM * rcmd.USER_BEHAVIOR_LEN
        it1 = ub1 + rcmd.ITEM_EMB_DIM
        x = np.empty((n, it1 + i_w), np.float32)
        gather_rows_into(x, 0, u_mat, u_idx)
        gather_rows_into(x, it1, i_mat, i_idx)
        gather_rows_into(x, ub1, emb_mat, emb_rows_of(iid))
        gather_emb_rows_into(x, ub0, emb_mat, beh_idx)
    total = sum(stages.values())
    print(f"rows {n}  width {x.shape[1]}  total {total:.1f}s  "
          f"({n / max(total, 1e-9):,.0f} rows/s)")


if __name__ == "__main__":
    main()
