"""Benchmark harness — prints ONE JSON line.

Headline metric: DIN training throughput (examples/s) on the flagship ranker
at MovieLens dims, vs the reference's CPU baseline. The reference trains MLP
on 79,948 MovieLens-100k samples in 28 s (~2,855 ex/s end-to-end,
/root/reference/README.md:160-165); that is the vs_baseline denominator.
"""
from __future__ import annotations

import json
import time

import numpy as np

# reference: 79,948 samples / 28 s wall for a full train run (README.md:160-165)
BASELINE_EXAMPLES_PER_S = 79_948 / 28.0


def main() -> None:
    import jax

    from goctr_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()

    from goctr_tpu.models import DIN, SampleInfo, TrainSample, train_ranker
    from goctr_tpu.models.trainer import TrainerConfig

    U, T, D, I, C = 8, 10, 16, 16, 4
    W = U + T * D + I + C
    info = SampleInfo((0, U), (U, U + T * D), (U + T * D, U + T * D + I),
                      (U + T * D + I, W))
    n = 200_000
    rng = np.random.default_rng(0)
    x = rng.random((n, W)).astype(np.float32)
    y = (rng.random(n) > 0.5).astype(np.float32)
    sample = TrainSample(x=x, y=y, info=info)

    model = DIN(U, T, D, I, C, activation="relu")
    epochs = 8
    cfg = TrainerConfig(batch_size=8192, epochs=epochs, early_stop=0,
                        lr=1e-3, shuffle=True, seed=0)

    ranker = train_ranker(model, sample, cfg)
    # first epoch includes jit compile; steady state = epochs 2..n
    steady = ranker.epoch_times[1:]
    examples_per_s = len(steady) * n / sum(steady)

    print(json.dumps({
        "metric": "din_train_examples_per_s",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
