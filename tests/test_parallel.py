"""Multi-chip sharding tests on the virtual 8-device CPU mesh (the test tier
the reference entirely lacks — SURVEY.md §4 'add what the reference lacks')."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from goctr_tpu.core.meshes import MeshSpec, make_mesh
from goctr_tpu.parallel import (
    EmbeddingSpec, SparseBatch, SparseCTR, init_table, make_sharded_train_step,
    sharded_lookup, sharded_pooled_lookup,
)
from goctr_tpu.parallel.train import batch_shardings, param_shardings


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshSpec(data=4, model=2))


def test_sharded_lookup_matches_take(mesh):
    spec = EmbeddingSpec("t", vocab=100, dim=8)
    table = init_table(jax.random.key(0), spec, mesh)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (16,)), jnp.int32)
    got = sharded_lookup(table, ids, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_padding_ids(mesh):
    spec = EmbeddingSpec("t", vocab=64, dim=4)
    table = init_table(jax.random.key(1), spec, mesh)
    ids = jnp.asarray([-1, 5, -1, 63, 0, 1, 2, 3], jnp.int32)
    got = np.asarray(sharded_lookup(table, ids, mesh))
    assert np.all(got[0] == 0) and np.all(got[2] == 0)
    np.testing.assert_allclose(got[3], np.asarray(table)[63], rtol=1e-6)


def test_sharded_lookup_2d_ids(mesh):
    spec = EmbeddingSpec("t", vocab=32, dim=4)
    table = init_table(jax.random.key(2), spec, mesh)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 32, (8, 5)), jnp.int32)
    got = sharded_lookup(table, ids, mesh)
    assert got.shape == (8, 5, 4)
    want = jnp.take(table, ids.ravel(), axis=0).reshape(8, 5, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pooled_lookup_mean_with_padding(mesh):
    spec = EmbeddingSpec("t", vocab=50, dim=4)
    table = init_table(jax.random.key(3), spec, mesh)
    tbl = np.asarray(table)
    ids = jnp.asarray([[1, 2, -1], [7, -1, -1], [3, 4, 5], [-1, -1, -1],
                       [0, 0, 0], [1, 1, -1], [9, 8, 7], [10, 11, 12]],
                      jnp.int32)
    got = np.asarray(sharded_pooled_lookup(table, ids, mesh, combiner="mean"))
    np.testing.assert_allclose(got[0], (tbl[1] + tbl[2]) / 2, rtol=1e-5)
    np.testing.assert_allclose(got[1], tbl[7], rtol=1e-5)
    np.testing.assert_allclose(got[3], np.zeros(4), atol=1e-7)


def test_lookup_gradient_scatter(mesh):
    """d/dtable of sum(lookup(table, ids)) puts per-row counts in the rows."""
    spec = EmbeddingSpec("t", vocab=16, dim=2)
    table = init_table(jax.random.key(4), spec, mesh)
    ids = jnp.asarray([3, 3, 5, 7, 3, 5, 1, 0], jnp.int32)

    def f(tbl):
        return jnp.sum(sharded_lookup(tbl, ids, mesh))

    g = np.asarray(jax.grad(f)(table))
    counts = np.zeros(16)
    for i in np.asarray(ids):
        counts[i] += 1
    np.testing.assert_allclose(g[:, 0], counts, rtol=1e-6)


def test_dedup_lookup_matches_direct(mesh):
    """dedup_cap path (sorted unique exchange) must be exact when the
    per-shard unique count fits the cap — forward AND gradient."""
    spec = EmbeddingSpec("t", vocab=64, dim=8)
    table = init_table(jax.random.key(5), spec, mesh)
    rng = np.random.default_rng(2)
    # heavy repetition (8 hot ids) + pads; 32 rows over data=4 → 8/shard
    ids = rng.choice([1, 2, 3, 40, 41, 42, 63, 0], size=(32, 6)).astype(np.int32)
    ids[rng.random((32, 6)) < 0.2] = -1
    ids = jnp.asarray(ids)

    want = sharded_lookup(table, ids, mesh)
    got = sharded_lookup(table, ids, mesh, dedup_cap=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def loss_direct(tbl):
        return jnp.sum(sharded_lookup(tbl, ids, mesh) ** 2)

    def loss_dedup(tbl):
        return jnp.sum(sharded_lookup(tbl, ids, mesh, dedup_cap=16) ** 2)

    g1 = np.asarray(jax.grad(loss_direct)(table))
    g2 = np.asarray(jax.grad(loss_dedup)(table))
    np.testing.assert_allclose(g2, g1, rtol=1e-5)


def test_dedup_flat_semantics():
    from goctr_tpu.parallel.embedding import _dedup_flat

    flat = jnp.asarray([5, 3, 5, 5, -1, 3, 9], jnp.int32)
    uniq, inv, n_unique = _dedup_flat(flat, cap=8)
    assert int(n_unique) == 4                      # {-1, 3, 5, 9}
    u = np.asarray(uniq)
    np.testing.assert_array_equal(u[:4], [-1, 3, 5, 9])
    np.testing.assert_array_equal(u[4:], -1)       # padding
    # every position maps back to its own value
    np.testing.assert_array_equal(u[np.asarray(inv)], np.asarray(flat))


def test_sparse_ctr_sharded_train_step_runs_and_learns(mesh):
    model = SparseCTR(item_vocab=1000, emb_dim=8, u_profile_dim=4, ctx_dim=2,
                      behavior_len=5, hidden=(32, 16))
    params = model.init_params(jax.random.key(0), mesh)
    solver = optax.adam(1e-2)
    opt_state = solver.init(params)
    step = make_sharded_train_step(model, solver, mesh)

    rng = np.random.default_rng(0)
    B = 64
    # planted signal: label = 1 iff item_id parity matches first behavior id
    bids = rng.integers(0, 1000, (B, 5)).astype(np.int32)
    iids = rng.integers(0, 1000, B).astype(np.int32)
    y = ((bids[:, 0] % 2) == (iids % 2)).astype(np.float32)
    bsh = batch_shardings(mesh)
    batch = SparseBatch(
        user_profile=jax.device_put(rng.random((B, 4)).astype(np.float32),
                                    bsh.user_profile),
        behavior_ids=jax.device_put(bids, bsh.behavior_ids),
        item_ids=jax.device_put(iids, bsh.item_ids),
        ctx=jax.device_put(rng.random((B, 2)).astype(np.float32), bsh.ctx),
        labels=jax.device_put(y, bsh.labels),
    )
    params = jax.device_put(params, param_shardings(params, mesh))
    opt_state = jax.device_put(opt_state, param_shardings(opt_state, mesh))

    losses = []
    key = jax.random.key(1)
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    # table stays sharded across steps
    sh = params["item_table"].sharding
    assert "model" in str(sh.spec) or sh.spec[0] == "model"
