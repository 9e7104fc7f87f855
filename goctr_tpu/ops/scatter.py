"""Sorted/deduplicated scatter-add for sparse row updates.

XLA must assume a plain `.at[ids].add(rows)` may contain colliding indices
and serializes the writes (measured ~order-of-magnitude slower than the
tower compute at DLRM scale, BENCH_NOTES.md). Sorting + segment-summing
duplicates lets the scatter carry `indices_are_sorted` + `unique_indices`.
MEASURED CAVEAT (BENCH_NOTES r2): on a v5e these promises do NOT unlock a
vectorized scatter — XLA still emits a sequential per-row loop at the same
~4M row-updates/s as plain mode. What dedup buys is (a) exact row-wise
adagrad (duplicates no longer race) and (b) collision-free pairwise-distinct
rows, the contract the Pallas fused row-optimizer
(ops/pallas/row_optimizer.py) needs to overlap its read-modify-write DMAs —
THAT kernel is the fast path, not this scatter. Used by the scanned
SparseCTR trainer (parallel/scanned.py) and word2vec (embedding/word2vec.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DNUMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,))


def scatter_add_rows(table: jax.Array, ids: jax.Array, rows: jax.Array, *,
                     sorted_ids: bool = False,
                     unique: bool = False) -> jax.Array:
    """scatter-add rows [N, D] into table [V, D] at ids [N]; negative or
    out-of-range ids are dropped (FILL_OR_DROP)."""
    return jax.lax.scatter_add(
        table, ids[:, None], rows, _DNUMS, indices_are_sorted=sorted_ids,
        unique_indices=unique, mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def scatter_add_dedup(table: jax.Array, ids: jax.Array,
                      rows: jax.Array) -> jax.Array:
    """table[ids] += rows with duplicate ids pre-summed on device.

    ids [N] (negatives dropped), rows [N, D] → new table [V, D]. Exactly
    equivalent to `.at[ids].add(rows)` up to float summation order; the
    sort + segment-sum turns the scatter collision-free so XLA emits the
    fast path.
    """
    n = ids.shape[0]
    v = table.shape[0]
    order = jnp.argsort(ids)
    s_ids = jnp.take(ids, order)              # negatives sort first → dropped
    s_rows = jnp.take(rows, order, axis=0)
    new = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(new) - 1
    summed = jax.ops.segment_sum(s_rows, seg, num_segments=n,
                                 indices_are_sorted=True)
    # unused slots get DISTINCT ascending out-of-range sentinels so the
    # sorted+unique promises stay strictly true; FILL_OR_DROP drops them
    sentinel = v + 1 + jnp.arange(n, dtype=jnp.int32)
    uniq = sentinel.at[seg].set(s_ids, mode="drop")
    return scatter_add_rows(table, uniq, summed, sorted_ids=True, unique=True)


def dedup_sum_rows(ids: jax.Array, rows: jax.Array, vocab: int):
    """(uniq_ids [N] sorted with out-of-range sentinels, summed_rows [N, D]):
    the dedup half of scatter_add_dedup, for callers that transform the
    summed row update before writing (e.g. adagrad row scaling)."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    s_ids = jnp.take(ids, order)
    s_rows = jnp.take(rows, order, axis=0)
    new = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(new) - 1
    summed = jax.ops.segment_sum(s_rows, seg, num_segments=n,
                                 indices_are_sorted=True)
    sentinel = vocab + 1 + jnp.arange(n, dtype=jnp.int32)
    uniq = sentinel.at[seg].set(s_ids, mode="drop")
    return uniq, summed
