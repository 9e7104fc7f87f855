"""HTTP serving throughput: full roundtrip through RecApiServer.

Reference serving path parity (api.go:106-131): POST /api/v1/recommend with
{userId, itemIdList[400]} → scored list. Measures end-to-end scores/s over
the HTTP stack (JSON decode → feature assembly → jitted predict → JSON
encode) with `--threads` concurrent clients.

    python scripts/bench_serving.py [--cpu] [--requests=50] [--items=400]
                                    [--threads=4]

Run with --cpu for the host-serving figure: through the axon relay every
dispatch pays ~30 ms (SKILL.md), which measures the tunnel, not the
framework; real TPU serving would batch requests server-side. bench.py
--serve-bench reports the on-TPU batched scoring rate separately.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")


def _arg(name: str, default: int) -> int:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def main() -> None:
    from goctr_tpu.data.fixture import generate_movielens_fixture
    from goctr_tpu.data.movielens import MovielensRec
    from goctr_tpu.models.trainer import TrainerConfig
    from goctr_tpu.recommend.rcmd import Context, RankerFitter, Train
    from goctr_tpu.serve.api import RecApiServer

    n_req = _arg("requests", 50)
    n_items = _arg("items", 400)
    threads = _arg("threads", 4)

    db = os.path.join(tempfile.mkdtemp(), "ml.db")
    generate_movielens_fixture(db, n_users=200, n_movies=500,
                               n_ratings=12000, seed=7)
    rec = MovielensRec(db, sample_cnt=12000)
    predictor = Train(Context(), rec,
                      RankerFitter("mlp", TrainerConfig(
                          batch_size=256, epochs=3, early_stop=0, lr=3e-3)))
    server = RecApiServer(predictor, port=0).start(background=True)
    url = f"http://127.0.0.1:{server.port}/api/v1/recommend"
    items = list(range(1, n_items + 1))

    def one(uid: int) -> int:
        req = urllib.request.Request(
            url, data=json.dumps({"userId": 1 + uid % 100,
                                  "itemIdList": items}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return len(json.loads(r.read())["itemScoreList"])

    one(0)                                     # warm (compile + caches)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(threads) as pool:
        total = sum(pool.map(one, range(n_req)))
    dt = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} threads={threads} "
          f"requests={n_req} items/req={n_items}")
    print(f"HTTP serving: {total} scores / {dt:.2f}s = "
          f"{total / dt:.0f} scores/s ({n_req / dt:.1f} req/s)")
    server.stop()


if __name__ == "__main__":
    main()
