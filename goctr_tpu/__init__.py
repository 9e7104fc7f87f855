"""goctr_tpu — a TPU-native CTR prediction & ranking framework.

A from-scratch re-design of the capabilities of auxten/go-ctr (reference at
/root/reference) for TPU hardware: JAX/XLA/Pallas compute, pjit/shard_map
parallelism over device meshes, and a host-side data plane feeding the chips.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  core/      — mesh setup, dtype policy, config, PRNG discipline, metrics (AUC+GAUC)
  features/  — jittable feature encoders/scalers + sklearn-style matrix preprocessing
  embedding/ — item2vec skip-gram trainer (batched negative-sampling / hierarchical
               softmax on device), embedding store + cosine top-k search
  ops/       — activations/losses + Pallas TPU kernels for the hot ops
  models/    — MLP / YouTube-DNN / DIN rankers as functional pytree models
  optim/     — solver registry (sgd/adam/adagrad/rmsprop/adadelta/lbfgs) + LR schedules
  parallel/  — row-sharded embedding tables, data-parallel train steps over a Mesh
  recommend/ — orchestrator: RecSys protocol, Train / Rank / BatchPredict, caches
  serve/     — HTTP scoring API (stdlib, zero extra deps) + dashboard endpoints
  data/      — SQLite/MySQL schema scanners, sample pipeline, MovieLens example
  utils/     — small helpers mirroring reference utils/
"""

__version__ = "0.1.0"
