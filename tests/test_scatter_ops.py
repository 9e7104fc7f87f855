"""Sorted/dedup scatter-add vs the .at[].add oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.ops.scatter import scatter_add_dedup, scatter_add_rows


def test_scatter_add_dedup_matches_at_add(rng):
    v, d, n = 40, 8, 500
    table = jnp.asarray(rng.normal(0, 1, (v, d)).astype(np.float32))
    ids = rng.integers(0, v, n).astype(np.int32)
    ids[rng.random(n) < 0.2] = -1            # dropped
    rows = rng.normal(0, 1, (n, d)).astype(np.float32)

    want = np.array(table)
    for i, r in zip(ids, rows):
        if i >= 0:
            want[i] += r
    got = np.asarray(scatter_add_dedup(table, jnp.asarray(ids),
                                       jnp.asarray(rows)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scatter_add_rows_drops_out_of_range(rng):
    table = jnp.zeros((10, 4), jnp.float32)
    ids = jnp.asarray([-1, 3, 3, 11, 5], jnp.int32)
    rows = jnp.ones((5, 4), jnp.float32)
    got = np.asarray(scatter_add_rows(table, ids, rows))
    assert got[3, 0] == 2.0 and got[5, 0] == 1.0
    assert got.sum() == 3 * 4
