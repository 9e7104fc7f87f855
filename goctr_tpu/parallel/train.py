"""Sharded training step: DP over `data`, tables row-sharded over `model`.

One jitted step with NamedSharding-annotated inputs; XLA/GSPMD inserts the
gradient psum over `data` for the replicated dense params, while the
embedding-table gradient stays shard-local (the shard_map lookup's transpose
scatter-adds only into the owning shard's rows). Donated params/opt_state keep
HBM flat. This is the TPU replacement for the reference's single-threaded
tape-VM step (model/model.go:111-197) — and the `dryrun_multichip` surface.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from goctr_tpu.core.meshes import DATA_AXIS, MODEL_AXIS
from goctr_tpu.parallel.sparse_ctr import SparseBatch, SparseCTR


def _on_axon_relay() -> bool:
    """This dev environment's tunneled TPU registers as JAX_PLATFORMS=axon
    (device.platform still reports 'tpu')."""
    import os
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


def param_shardings(params, mesh: Mesh):
    """Tables row-sharded over model; everything else replicated."""
    def one(path, leaf):
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if "table" in name:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(one, params)


def batch_shardings(mesh: Mesh) -> SparseBatch:
    s = NamedSharding(mesh, P(DATA_AXIS))
    s2 = NamedSharding(mesh, P(DATA_AXIS, None))
    return SparseBatch(user_profile=s2, behavior_ids=s2, item_ids=s,
                       ctx=s2, labels=s)


def make_sharded_train_step(model: SparseCTR, solver: optax.GradientTransformation,
                            mesh: Mesh) -> Callable:
    """Returns jitted step(params, opt_state, batch, key) → (params,
    opt_state, loss). Inputs must be placed with `param_shardings` /
    `batch_shardings`."""

    def loss_fn(params, batch: SparseBatch, key):
        logits = model.apply(params, batch, mesh, train=True, key=key)
        y = batch.labels
        losses = (jnp.maximum(logits, 0) - logits * y +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.mean(losses)

    # donation of NamedSharding-placed inputs hangs this environment's axon
    # relay compiler (plain-array donation is fine); donate everywhere else —
    # it keeps the table update in-place, halving HBM churn per step
    donate = () if _on_axon_relay() else (0, 1)

    @partial(jax.jit, donate_argnums=donate)
    def step(params, opt_state, batch: SparseBatch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = solver.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def make_sharded_predict(model: SparseCTR, mesh: Mesh) -> Callable:
    @jax.jit
    def predict(params, batch: SparseBatch):
        return jax.nn.sigmoid(model.apply(params, batch, mesh, train=False))
    return predict
