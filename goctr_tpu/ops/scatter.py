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
    equivalent to `.at[ids].add(rows)` up to float summation order. The
    duplicate summing is SCATTER-FREE (ops/segsum.py sorted-run sums —
    jax.ops.segment_sum would itself lower to a serial XLA scatter,
    BENCH_NOTES r3), so only ONE scatter remains: run-end positions carry
    the full run sum, every other position carries exact zeros aimed at
    row 0 (a no-op add; tables here have no junk rows to absorb them, and
    out-of-range-drop scatters mixed with unique promises are the
    combination that faulted the TPU worker at scale — BENCH_NOTES r2).
    """
    from goctr_tpu.ops.segsum import segment_rows_dedup

    n = ids.shape[0]
    v = table.shape[0]
    n_to = -(-n // 1024) * 1024
    tgt, summed = segment_rows_dedup(ids, rows, v, pad_to=n_to)
    safe = jnp.where(tgt < v, tgt, 0)         # junk/pad slots: zero rows
    return table.at[safe].add(summed)


