"""Sorted-run fused sparse-row optimizer Pallas kernel (v2 of the table
update).

The v1 path (ops/pallas/row_optimizer.py) needs its update rows
pre-deduplicated, which costs a whole XLA pipeline per batch: blockwise
run sums (cumsum + cummax + a boundary row-gather, 18.8 ms at bench
scale), grad packing to 128 lanes (4.6 ms), and a junk-row region in the
table for the non-final run positions (554 MB at bs=32768) — measured in
BENCH_NOTES r3. This kernel deletes all of that by consuming the SORTED
row-gradient stream with duplicates still in it:

  * positions are walked in order; duplicate ids are adjacent (the caller
    sorts), so each run of equal ids is accumulated into a VMEM register
    row and ONE read-modify-write DMA pair updates the table row at the
    run's end;
  * the table row read for a run is prefetched RING positions ahead of
    the compute pointer (issued when the lookahead crosses the run's
    start), so singleton runs — the zipf tail, the common case — keep
    RING reads in flight exactly like v1;
  * per-slot outstanding-read/write bitmasks live in SMEM scratch and
    persist across grid blocks, so runs may span blocks and writes drain
    only once, at the end of the last block;
  * a run whose prefetch found its ring slot still busy (only possible
    behind a long run that holds its slot across ≥ RING positions) falls
    back to a dedicated repair slot at its end — correctness never
    depends on the prefetch succeeding.

Per run the update is the same DLRM-style row-wise adagrad as v1:
    acc' = acc + ‖Σ g_dup‖²,  w' = w − lr · Σ g_dup · rsqrt(acc' + eps)
(or sgd: w' = w − lr · Σ g_dup), on the packed [V, 128] (w | acc | pad)
table layout, aliased in place.

Id / flag encoding: ids, the run-start flag, and the run-end flag arrive
packed in one int32 SMEM stream (id | start << 29 | end << 30), so the
scalar core pays ONE SMEM load per position — the kernel is scalar-issue
bound, not bandwidth bound. Vocab is therefore capped at 2^29 − 2 (536M;
BASELINE config #5's 100M fits).

Reference parity note: the reference has no sparse-table trainer (its
embeddings are a frozen in-RAM Go map, rcmd.go:501-531); this kernel
exists to push the TPU framework's joint 10M-row table training toward
its DMA-issue speed-of-light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from goctr_tpu.ops.pallas.row_optimizer import (  # noqa: F401  (re-export:
    pack_table, unpack_table)                     # same packed layout)

LANES = 128
ROWS_PER_STEP = 1024      # positions per grid step
RING = 8                  # outstanding read/write DMA pairs (+1 repair read)
_ID_BITS = 29
ID_MASK = (1 << _ID_BITS) - 1
_START = 1 << _ID_BITS
_END = 1 << (_ID_BITS + 1)

# SMEM state slots (persist across grid blocks)
_OUT_R, _OUT_W, _SLOT, _ISSUED = 0, 1, 2, 3


def _kernel(meta_ref, lr_ref, g_ref, tin_ref, tout_ref,
            rbuf, wbuf, acc, st, r_sems, w_sems, *, d: int, kind: str,
            eps: float, r: int, skip_ge: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    m_acc = (lane == d).astype(jnp.float32)       # accumulator lane
    lr = lr_ref[0, 0]

    def parts(lt):
        meta = meta_ref[lt]
        idv = meta & ID_MASK
        return (idv, idv < skip_ge, (meta & _START) != 0, (meta & _END) != 0)

    def read_dma(slot, idv):
        return pltpu.make_async_copy(
            tin_ref.at[pl.ds(idv, 1)], rbuf.at[slot], r_sems.at[slot])

    def write_dma(slot, idv):
        return pltpu.make_async_copy(
            wbuf.at[slot], tout_ref.at[pl.ds(idv, 1)], w_sems.at[slot])

    def maybe_issue(lt):
        """Prefetch the table-row read for a run starting at local lt, iff
        its ring slot is free. Slot = global position % RING (r % RING ==
        0, so local lt % RING is the same thing)."""
        idv, real, start, _ = parts(lt)
        slot = lt % RING
        bit = jax.lax.shift_left(jnp.int32(1), slot)

        @pl.when(start & real & ((st[_OUT_R] & bit) == 0))
        def _():
            read_dma(slot, idv).start()
            st[_OUT_R] = st[_OUT_R] | bit

    @pl.when(i == 0)
    def _init():
        st[_OUT_R] = 0
        st[_OUT_W] = 0
        st[_SLOT] = 0
        st[_ISSUED] = 0
        acc[...] = jnp.zeros((1, LANES), jnp.float32)

    # block-start warm loop: issue for local [0, RING) — these lookaheads
    # belonged to the previous block's tail bodies, whose SMEM ids block
    # could not see this block's ids (on block 0 this IS the warm-up)
    def warm(t, carry):
        maybe_issue(t)
        return carry

    jax.lax.fori_loop(0, min(RING, r), warm, 0)

    def body(lt, carry):
        idv, real, start, end = parts(lt)

        @pl.when(real & start)
        def _open_run():
            # read-prefetch bookkeeping: the slot bit is deterministic
            # here — earlier runs' reads were cleared at their ends, and
            # position lt + RING has not been issued yet (issue step runs
            # after this, and only for lt + RING)
            slot = lt % RING
            st[_SLOT] = slot
            st[_ISSUED] = jax.lax.shift_right_logical(
                st[_OUT_R], slot) & 1
            acc[0:1, 0:d] = g_ref[pl.ds(lt, 1), :]

        @pl.when(real & jnp.logical_not(start))
        def _accumulate():
            acc[0:1, 0:d] = acc[0:1, 0:d] + g_ref[pl.ds(lt, 1), :]

        @pl.when(real & end)
        def _close_run():
            slot = st[_SLOT]
            issued = st[_ISSUED]

            @pl.when(issued == 0)
            def _repair():               # prefetch lost the slot race
                read_dma(RING, idv).start()

            rslot = jnp.where(issued != 0, slot, RING)
            read_dma(rslot, idv).wait()
            rbit = jax.lax.shift_left(jnp.int32(1), slot)

            @pl.when(issued != 0)
            def _clear_read():
                st[_OUT_R] = st[_OUT_R] & jnp.invert(rbit)

            row = rbuf[rslot]                     # (1, 128): w | acc | pad
            a = acc[...]                          # (1, 128): Σg | 0...
            wslot = lt % RING
            wbit = jax.lax.shift_left(jnp.int32(1), wslot)

            @pl.when((st[_OUT_W] & wbit) != 0)
            def _wait_prev_write():
                write_dma(wslot, idv).wait()

            if kind == "adagrad":
                nsq = jnp.sum(a * a, axis=1, keepdims=True)   # ‖Σg‖²
                r_acc = row + nsq * m_acc                     # acc' lane d
                av = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
                scale = lr * jax.lax.rsqrt(av + eps)
                wbuf[wslot] = r_acc - scale * a   # a is 0 outside lanes :d
            else:                                 # sgd
                wbuf[wslot] = row - lr * a
            write_dma(wslot, idv).start()
            st[_OUT_W] = st[_OUT_W] | wbit

        @pl.when(lt + RING < r)
        def _lookahead():
            maybe_issue(lt + RING)

        return carry

    jax.lax.fori_loop(0, r, body, 0)

    @pl.when(i == nb - 1)
    def _drain():
        def one(slot, carry):
            bit = jax.lax.shift_left(jnp.int32(1), slot)

            @pl.when((st[_OUT_W] & bit) != 0)
            def _():
                pltpu.make_async_copy(
                    wbuf.at[slot], tout_ref.at[pl.ds(0, 1)],
                    w_sems.at[slot]).wait()
            return carry

        jax.lax.fori_loop(0, RING, one, 0)


def pack_meta(s_ids: jax.Array) -> jax.Array:
    """SORTED ids [n] int32 → packed (id | start<<29 | end<<30) stream."""
    start = jnp.concatenate(
        [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    end = jnp.concatenate(
        [s_ids[1:] != s_ids[:-1], jnp.ones((1,), bool)])
    return (s_ids | jnp.where(start, _START, 0)
            | jnp.where(end, _END, 0)).astype(jnp.int32)


def apply_run_updates(table_packed, s_ids, s_rows, lr, d: int,
                      kind: str = "adagrad", eps: float = 1e-8,
                      skip_ge: int | None = None,
                      interpret: bool = False) -> jax.Array:
    """In-place sorted-run fused optimizer.

    table_packed [V, 128] f32 (w | acc | pad); s_ids [n] int32 SORTED
    ascending with duplicates (each duplicate's gradient separate in
    s_rows [n, d] f32); rows with id >= skip_ge (default: V) are skipped
    entirely — callers map -1 pads and alignment padding to id V, which
    sorts last and is never dereferenced, so the table needs NO junk
    rows. n must be a multiple of 1024. Vocab cap: 2^29 - 2.

    Returns the updated table (input aliased in place). On non-TPU
    backends routes to an identical-math jnp fallback unless
    interpret=True forces the emulated Pallas path (unit tests).
    """
    v = table_packed.shape[0]
    if skip_ge is None:
        skip_ge = v
    if not 0 < d < LANES:
        raise ValueError(f"run optimizer requires 0 < d < {LANES}")
    if skip_ge > ID_MASK - 1:
        raise ValueError(f"vocab {skip_ge} exceeds the packed-id cap "
                         f"{ID_MASK - 1}")
    if not interpret and jax.default_backend() != "tpu":
        return _apply_run_updates_jnp(table_packed, s_ids, s_rows, lr,
                                      kind, eps, d, skip_ge)
    n = s_ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    meta = pack_meta(s_ids)
    return pl.pallas_call(
        functools.partial(_kernel, d=d, kind=kind, eps=eps, r=r,
                          skip_ge=skip_ge),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # table in (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # table out (aliased)
        out_shape=jax.ShapeDtypeStruct(table_packed.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING + 1, 1, LANES), jnp.float32),   # rbuf
            pltpu.VMEM((RING, 1, LANES), jnp.float32),       # wbuf
            pltpu.VMEM((1, LANES), jnp.float32),             # run acc
            pltpu.SMEM((4,), jnp.int32),                     # state
            pltpu.SemaphoreType.DMA((RING + 1,)),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(meta, jnp.asarray(lr, jnp.float32).reshape(1, 1),
      s_rows.astype(jnp.float32), table_packed)


def _apply_run_updates_jnp(table_packed, s_ids, s_rows, lr, kind, eps,
                           d: int, skip_ge: int):
    """Reference/fallback path (CPU, tests): identical math via the
    scatter-free run sums + one unique-row set."""
    from goctr_tpu.ops.segsum import sorted_run_sums

    v = table_packed.shape[0]
    mask = (s_ids < skip_ge).astype(s_rows.dtype)
    tgt, rows = sorted_run_sums(s_ids, s_rows * mask[:, None],
                                junk_base=skip_ge + 1)
    real = tgt < skip_ge                        # ends of real runs
    # junk slots scatter out-of-bounds with drop — a junk rewrite of row 0
    # must NOT race a real update targeting row 0
    safe = jnp.where(real, tgt, v)
    cur = jnp.take(table_packed, jnp.where(real, tgt, 0), axis=0)
    nsq = jnp.sum(rows * rows, axis=1, keepdims=True)
    lane = jnp.arange(LANES)
    m_w = (lane < d).astype(jnp.float32)
    m_acc = (lane == d).astype(jnp.float32)
    rows_p = jnp.zeros((rows.shape[0], LANES), jnp.float32
                       ).at[:, :d].set(rows)
    if kind == "adagrad":
        r_acc = cur + nsq * m_acc
        av = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(av + eps)
        new = r_acc - scale * (rows_p * m_w)
    else:
        new = cur - jnp.asarray(lr, jnp.float32) * (rows_p * m_w)
    new = jnp.where(real[:, None], new, cur)
    return table_packed.at[safe].set(new, mode="drop")
