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
THAT kernel is the fast path, not this scatter. The serial wall is also
TABLE-SIZE dependent: at word2vec-scale vocabs (10k) plain .at[].add is
VECTORIZED by XLA (93.3M rows/s vs 27.7M for a sort+dedup front-end at
n=1.1M, BENCH_NOTES r3) — small tables should use plain scatters
(embedding/word2vec.py does). Used by the scanned SparseCTR trainer
(parallel/scanned.py) and the sharded sparse step (parallel/train.py).
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


