"""Scatter-free sorted-segment row sums — the dedup half of the fast
table-update path.

`jax.ops.segment_sum` lowers to an XLA scatter-add, which TPU executes as a
SEQUENTIAL per-row loop — measured 190 ms for 1M×64 rows on a v5e, i.e. the
dedup pipeline paid the serial-scatter wall it was built to avoid (r3
bench_kernels 'sort+segsum (no scatter)' row, BENCH_NOTES.md). This module
computes the same sorted-run sums with only vectorizable primitives:

  blockwise inclusive cumsum over the sorted rows (two-level: in-block
  cumsum batched over blocks + tiny block-offset cumsum), a cummax to find
  each position's run start, and ONE row gather at the run boundaries:

      run_sum(end i) = cumsum[i] − cumsum_exclusive[run_start(i)]

The output stays position-aligned (no compaction scatter): position i
carries its full run sum iff i is the LAST position of its run, else zeros;
target ids map non-final positions to DISTINCT junk rows. This is exactly
the contract of the fused Pallas row optimizer
(ops/pallas/row_optimizer.py: pairwise-distinct ids, zero rows are no-ops
for both sgd and adagrad), so the whole table update becomes
sort → cumsum → one gather → one streaming Pallas RMW pass — no XLA
scatter anywhere.

Reference parity note: the reference has no sparse-table trainer (its
embeddings are a frozen in-RAM Go map, rcmd.go:501-531); this exists to make
the TPU framework's 10M-row joint training fast.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 1024


def _cumsum_rows(x: jax.Array, block: int = _BLOCK) -> jax.Array:
    """Inclusive cumsum along axis 0 of [n, D], two-level blockwise.

    A direct jnp.cumsum over a long leading axis can lower to a deep
    reduce-window; reshaping to [n/block, block, D] keeps the in-block scan
    batched (vectorized over blocks) and the cross-block offset pass tiny.
    Requires n % block == 0 (callers pad to the fused kernel's grid
    multiple already).
    """
    n, d = x.shape
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    xb = x.reshape(nb, block, d)
    cb = jnp.cumsum(xb, axis=1)
    tot = cb[:, -1]                               # [nb, D]
    off = jnp.cumsum(tot, axis=0) - tot           # exclusive block offsets
    return (cb + off[:, None, :]).reshape(n, d)


def _cummax_i32(x: jax.Array, block: int = _BLOCK) -> jax.Array:
    """Inclusive cummax along a [n] int32 vector, same two-level scheme."""
    n = x.shape[0]
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    nb = n // block
    xb = x.reshape(nb, block)
    cb = jax.lax.cummax(xb, axis=1)
    tot = cb[:, -1]
    off = jnp.concatenate(
        [jnp.full((1,), jnp.iinfo(jnp.int32).min, x.dtype),
         jax.lax.cummax(tot, axis=0)[:-1]])
    return jnp.maximum(cb, off[:, None]).reshape(n)


def sorted_run_sums(s_ids: jax.Array, s_rows: jax.Array, junk_base):
    """(tgt [n] int32, rows [n, D]) for SORTED ids: position i is the last
    of its run → tgt = s_ids[i], rows = full run sum; otherwise tgt =
    junk_base + i (pairwise distinct), rows = 0.

    Scatter-free (see module docstring). `tgt` is pairwise distinct
    whenever junk_base + [0, n) does not intersect the real id range —
    callers allocate junk rows past the vocab (parallel/scanned.py
    table_pad_rows). n must be a multiple of 1024.
    """
    n, _ = s_rows.shape
    pos = jnp.arange(n, dtype=jnp.int32)
    c = _cumsum_rows(s_rows)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    is_end = jnp.concatenate(
        [s_ids[1:] != s_ids[:-1], jnp.ones((1,), bool)])
    # run start of each position: cummax over start-position indices
    start = _cummax_i32(jnp.where(is_start, pos, jnp.int32(0)))
    c_ex = c - s_rows                              # exclusive cumsum
    c_before = jnp.take(c_ex, start, axis=0)       # sum before my run
    rows = jnp.where(is_end[:, None], c - c_before, 0.0)
    tgt = jnp.where(is_end, s_ids,
                    jnp.asarray(junk_base, s_ids.dtype) + pos)
    return tgt, rows


def segment_rows_dedup(ids: jax.Array, rows: jax.Array, vocab: int,
                       pad_to: int = 0):
    """Full dedup front-end for the fused row optimizer: raw (possibly
    negative-padded, duplicate-heavy) ids [n] + row grads [n, D] →
    (tgt [n], summed_rows [n, D]) with tgt pairwise distinct and every
    non-real target in [vocab+1, vocab+1+2n) (junk rows; callers allocate
    them past the vocab). Negative ids contribute nothing (rows zeroed).

    sort → run sums, no scatter. If pad_to > n, inputs are first padded
    with -1 ids / zero rows (e.g. to the Pallas grid multiple).

    Junk-row budget: every pad maps to the SINGLE shared id `vocab` (their
    zeroed rows sort into one run whose sum is exactly zero — one no-op
    write), and non-final run positions map to vocab + 1 + sorted_pos, so
    callers only allocate n + 2 junk rows past the vocab
    (parallel/scanned.py table_pad_rows) — at bench scale the previous
    distinct-id-per-pad scheme cost 2n + 2 junk rows = an extra 554 MB of
    packed table, part of the r3 full-scale RESOURCE_EXHAUSTED budget.
    """
    n = ids.shape[0]
    if pad_to > n:
        ids = jnp.concatenate(
            [ids, jnp.full((pad_to - n,), -1, ids.dtype)])
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_to - n, rows.shape[1]), rows.dtype)])
        n = pad_to
    valid = ids >= 0
    rows = rows * valid[:, None].astype(rows.dtype)
    # pads → the shared junk id `vocab` (zero rows; one run, one no-op write)
    ids_clean = jnp.where(valid, ids, vocab)
    order = jnp.argsort(ids_clean)
    s_ids = jnp.take(ids_clean, order)
    s_rows = jnp.take(rows, order, axis=0)
    return sorted_run_sums(s_ids, s_rows, junk_base=vocab + 1)
