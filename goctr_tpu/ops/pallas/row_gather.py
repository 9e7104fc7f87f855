"""Pipelined random-row gather Pallas kernel.

The scanned sparse trainer's forward pass gathers (T+1) embedding rows per
example from a multi-GB table; XLA's dynamic row gather measured ~28.5 GB/s
effective on 256 B rows (BENCH_NOTES r2: the forward-only ceiling) — a few
percent of the chip's 819 GB/s stream bandwidth, because the fixed-function
gather issues row reads with little overlap. This kernel keeps a ring of
row DMAs in flight (same pattern as the fused row optimizer,
ops/pallas/row_optimizer.py:59-108, which this file's ring mirrors for the
read-only case): per grid step, R rows land in the VMEM output block with
up to RING outstanding HBM reads.

The table is the PACKED [V, 128]-lane layout the fused training mode
already uses (w | acc | pad): single-row DMAs need the 128-lane alignment
(Mosaic rejects (1, 64) f32 row DMAs — measured, see row_optimizer.py), so
the gather returns [n, 128] and callers slice the first D weight lanes
(XLA fuses the slice into the consumer).

Reference parity note: the reference gathers from an in-RAM Go map
(rcmd.go:501-531); this kernel exists to feed the TPU trainer at HBM speed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_STEP = 2048      # [R, 128] f32 output block = 1 MB VMEM
RING = 16                 # outstanding row-read DMAs


def _kernel(ids_ref, tin_ref, out_ref, sems, *, n_rows: int):
    def dma(j):
        slot = j % RING
        return pltpu.make_async_copy(
            tin_ref.at[pl.ds(ids_ref[j], 1)], out_ref.at[pl.ds(j, 1)],
            sems.at[slot])

    def body(j, carry):
        @pl.when(j >= RING)
        def _wait_prev():
            dma(j - RING).wait()         # slot free → safe to reuse
        dma(j).start()
        return carry

    jax.lax.fori_loop(0, n_rows, body, 0)

    def drain(t, carry):
        dma(jnp.maximum(n_rows - RING, 0) + t).wait()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), drain, 0)


def gather_rows_packed(table_packed: jax.Array, ids: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """table_packed [V, 128] f32, ids [n] int32 (in-bounds; duplicates fine
    — reads don't race) → [n, 128] f32. n must be a multiple of 2048 (pad
    ids with any valid row, e.g. 0, and drop the tail).

    On non-TPU backends routes to jnp.take unless interpret=True forces the
    emulated Pallas path (unit tests).
    """
    if not interpret and jax.default_backend() != "tpu":
        return jnp.take(table_packed, ids, axis=0)
    n = ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    return pl.pallas_call(
        functools.partial(_kernel, n_rows=r),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # table (HBM)
        ],
        out_specs=pl.BlockSpec((r, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ids, table_packed)
