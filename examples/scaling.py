"""Scaling measurement: SparseCTR sharded train-step throughput across mesh
sizes (BASELINE metric: examples/s at 1 chip / 1 host / N hosts).

On CPU (default) this exercises the real sharding program on virtual
devices — collective correctness and scaling shape, not absolute speed. On
a TPU slice run with JAX_PLATFORMS unset to measure real examples/s/chip.

    python examples/scaling.py                # virtual 8-device CPU sweep
    python examples/scaling.py --devices=1    # single real device
"""
from __future__ import annotations

import os
import sys
import time

if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") != "axon":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import optax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

from goctr_tpu.core.meshes import MeshSpec, make_mesh
from goctr_tpu.parallel import SparseBatch, SparseCTR, make_sharded_train_step
from goctr_tpu.parallel.train import batch_shardings, param_shardings


def measure(n_devices: int, model_shards: int, batch_per_device: int = 4096,
            vocab: int = 1_000_000, steps: int = 20) -> float:
    mesh = make_mesh(MeshSpec(data=n_devices // model_shards,
                              model=model_shards),
                     devices=jax.devices()[:n_devices])
    model = SparseCTR(item_vocab=vocab, emb_dim=16, u_profile_dim=8,
                      ctx_dim=4, behavior_len=10, hidden=(200, 80))
    params = model.init_params(jax.random.key(0), mesh)
    solver = optax.adam(1e-3)
    opt_state = solver.init(params)
    params = jax.device_put(params, param_shardings(params, mesh))
    opt_state = jax.device_put(opt_state, param_shardings(opt_state, mesh))
    step = make_sharded_train_step(model, solver, mesh)

    B = batch_per_device * mesh.shape["data"]
    rng = np.random.default_rng(0)
    bsh = batch_shardings(mesh)
    batch = SparseBatch(
        user_profile=jax.device_put(
            rng.random((B, 8)).astype(np.float32), bsh.user_profile),
        behavior_ids=jax.device_put(
            rng.integers(0, vocab, (B, 10)).astype(np.int32),
            bsh.behavior_ids),
        item_ids=jax.device_put(
            rng.integers(0, vocab, B).astype(np.int32), bsh.item_ids),
        ctx=jax.device_put(rng.random((B, 4)).astype(np.float32), bsh.ctx),
        labels=jax.device_put(
            (rng.random(B) > 0.5).astype(np.float32), bsh.labels),
    )
    key = jax.random.key(1)
    # warm-up/compile
    params, opt_state, loss = step(params, opt_state, batch, key)
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
    float(loss)
    dt = time.perf_counter() - t0
    return steps * B / dt


def main() -> int:
    n_avail = len(jax.devices())
    targets = [int(a.split("=")[1]) for a in sys.argv[1:]
               if a.startswith("--devices=")] or None
    print(f"platform={jax.devices()[0].platform} devices={n_avail}")
    print(f"{'devices':>8} {'mesh':>8} {'examples/s':>14} {'scale':>7}")
    base = None
    for n in (targets or [1, 2, 4, 8]):
        if n > n_avail:
            break
        m = 2 if n >= 2 else 1
        eps = measure(n, m)
        base = base or eps
        print(f"{n:>8} {n // m}x{m:>6} {eps:>14,.0f} {eps / base:>6.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
