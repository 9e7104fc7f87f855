"""Sorted/dedup scatter-add vs the .at[].add oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from goctr_tpu.ops.scatter import scatter_add_rows


def test_scatter_add_rows_drops_out_of_range(rng):
    table = jnp.zeros((10, 4), jnp.float32)
    ids = jnp.asarray([-1, 3, 3, 11, 5], jnp.int32)
    rows = jnp.ones((5, 4), jnp.float32)
    got = np.asarray(scatter_add_rows(table, ids, rows))
    assert got[3, 0] == 2.0 and got[5, 0] == 1.0
    assert got.sum() == 3 * 4
