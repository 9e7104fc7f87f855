"""goctr_tpu CLI: train the MovieLens ranker and serve the scoring API.

Mirrors the reference binary (/root/reference/main.go:23-57): build
MovielensRec → train MLP (hidden [100], relu, adam, α=1e-5) → serve on
:8080. Config via dotted overrides, e.g.:

    python main.py --data.dsn=movielens.db --model.name=din \
                   --optim.max_iter=50 --serve.port=8080
    python main.py --fixture   # generate a synthetic movielens.db first
"""
from __future__ import annotations

import logging
import sys

from goctr_tpu.core.config import Config
from goctr_tpu.core.runtime import enable_compilation_cache


def main(argv: list[str]) -> int:
    cfg = Config()
    rest = cfg.apply_overrides(argv)
    logging.basicConfig(
        level=logging.DEBUG if cfg.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    log = logging.getLogger("goctr")
    enable_compilation_cache()

    if "--fixture" in rest:
        from goctr_tpu.data.fixture import generate_movielens_fixture
        generate_movielens_fixture(cfg.data.dsn)
        log.info("wrote synthetic fixture to %s", cfg.data.dsn)
        if rest == ["--fixture"]:
            return 0

    from goctr_tpu.data.movielens import MovielensRec
    from goctr_tpu.models.trainer import TrainerConfig
    from goctr_tpu.recommend import Context, RankerFitter, Train
    from goctr_tpu.serve.api import RecApiServer

    rec = MovielensRec(cfg.data.dsn, sample_cnt=80000)
    tc = TrainerConfig(
        batch_size=cfg.optim.batch_size, epochs=cfg.optim.max_iter,
        early_stop=cfg.optim.early_stop_patience, solver=cfg.optim.solver,
        lr=cfg.optim.lr, lr_schedule=cfg.optim.lr_schedule,
        l2=cfg.optim.alpha, weight_decay=cfg.optim.weight_decay,
        seed=cfg.seed, verbose=cfg.verbose)
    model_kw = {}
    if cfg.model.name == "mlp":
        model_kw = dict(hidden=tuple(cfg.model.hidden),
                        activation=cfg.model.activation)
    fitter = RankerFitter(cfg.model.name, tc, use_bf16=cfg.model.use_bf16,
                          **model_kw)

    log.info("training %s on %s ...", cfg.model.name, cfg.data.dsn)
    predictor = Train(Context(), rec, fitter)
    log.info("training done; serving on %s:%d%s", cfg.serve.host,
             cfg.serve.port, cfg.serve.api_path)
    RecApiServer(predictor, api_path=cfg.serve.api_path,
                 host=cfg.serve.host, port=cfg.serve.port).start()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
