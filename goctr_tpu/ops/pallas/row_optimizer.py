"""Fused sparse-row optimizer Pallas kernel (adagrad / sgd).

The scanned sparse trainer's wall is the embedding-table update: XLA lowers
scatter-add into a sequential per-row loop, and row-wise adagrad needs TWO
of them (accumulator + weights) — measured ~4M row-updates/s against a
12M-row table on a v5e (BENCH_NOTES.md), ~10x slower than the forward pass
it accompanies.

This kernel replaces both scatters with one streaming read-modify-write
pass over the batch's deduplicated update rows:

  * the table is PACKED: one 128-lane f32 row per vocab entry holding
    [w_0..w_{D-1} | adagrad_acc | 0-pad]. A full packed row satisfies
    Mosaic's 128-lane DMA alignment (single-row HBM DMAs of D=64 f32 are
    rejected otherwise — measured, see embedding_lookup.py), and makes the
    accumulator travel with its weights: ONE DMA pair per row updates both.
  * update rows arrive deduplicated (sorted unique ids + segment-summed
    gradients — the dedup pipeline of parallel/scanned.py), so rows in
    flight are pairwise distinct and reads/writes can overlap freely.
  * per grid step, a ring of K row buffers pipelines: wait(read j) →
    compute adagrad/sgd in VMEM → start(write j) → start(read j+K). The
    write-back of row j overlaps the reads of rows j+1..j+K.

Per row the update is (DLRM-standard row-wise adagrad):
    acc' = acc + ||g_row||²          (||g||² precomputed in lane D of g)
    w'   = w − lr · g · rsqrt(acc' + eps)
or plain sgd: w' = w − lr · g.

The table argument is aliased in-place (input_output_aliases), so the
caller's packed table buffer is updated without a copy.

Reference parity note: the reference has no sparse-table trainer at all
(its embeddings are a frozen in-RAM Go map, rcmd.go:501-531); this kernel
exists to make the TPU framework's 10M-row joint training fast, not to
mirror a Go component.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_STEP = 1024      # update rows per grid step ([R, 128] f32 = 512KB)
RING = 8                  # outstanding read/write DMA pairs


def _kernel(ids_ref, lr_ref, g_ref, tin_ref, tout_ref,
            rbuf, wbuf, r_sems, w_sems, *, d: int, kind: str, eps: float,
            n_rows: int, skip_ge: int | None):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    m_w = (lane < d).astype(jnp.float32)          # weight lanes
    m_acc = (lane == d).astype(jnp.float32)       # accumulator lane
    lr = lr_ref[0, 0]

    def is_real(j):
        # junk rows (dedup non-end positions + the shared pad row) carry
        # exact-zero updates — their RMW is the identity, so their DMA pair
        # is skipped entirely: at bench-scale zipf traffic 68.5% of
        # positions are junk (BENCH_NOTES r3) and the kernel is
        # scalar-core DMA-issue bound, so skipping is ~2x.
        if skip_ge is None:
            return True
        return ids_ref[j] < skip_ge

    def read_dma(j):
        slot = j % RING
        row = ids_ref[j]
        return pltpu.make_async_copy(
            tin_ref.at[pl.ds(row, 1)], rbuf.at[slot], r_sems.at[slot])

    def write_dma(j):
        slot = j % RING
        row = ids_ref[j]
        return pltpu.make_async_copy(
            wbuf.at[slot], tout_ref.at[pl.ds(row, 1)], w_sems.at[slot])

    def warm(t, carry):
        @pl.when(is_real(t))
        def _():
            read_dma(t).start()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), warm, 0)

    # `outstanding`: bitmask of wbuf slots with an in-flight write DMA.
    # With skips, "the previous j on this slot" may not have issued a
    # write, so slot-reuse waits key off this mask, not off j - RING.
    # (Wait descriptors only encode shape + semaphore — every copy here is
    # one (1, 128) row — so waiting with row j's descriptor correctly
    # drains whichever earlier copy signalled w_sems[slot].)
    def body(j, outstanding):
        slot = j % RING
        bit = jax.lax.shift_left(jnp.int32(1), slot)
        real = is_real(j)

        @pl.when(real)
        def _compute():
            @pl.when((outstanding & bit) != 0)
            def _wait_prev_write():
                write_dma(j).wait()       # frees wbuf[slot] for reuse

            read_dma(j).wait()
            r = rbuf[slot]                        # (1, 128): w | acc | pad
            gp = g_ref[pl.ds(j, 1), :]            # (1, 128): g | ‖g‖² | 0
            if kind == "adagrad":
                r_acc = r + gp * m_acc            # acc' in lane D
                acc = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
                scale = lr * jax.lax.rsqrt(acc + eps)
                wbuf[slot] = r_acc - scale * (gp * m_w)
            else:                                 # sgd
                wbuf[slot] = r - lr * (gp * m_w)
            write_dma(j).start()

        @pl.when((j + RING < n_rows) & is_real(j + RING))
        def _start_next_read():
            # rbuf[slot] was consumed above (or is idle if j was junk)
            read_dma(j + RING).start()

        return jnp.where(real, outstanding | bit, outstanding)

    outstanding = jax.lax.fori_loop(0, n_rows, body, jnp.int32(0))

    # drain: every slot with an in-flight write must land before the
    # kernel (and program) completes. The descriptor's address is unused by
    # wait (shape + semaphore only) — use row 0 so a junk first id (which
    # may exceed the table when the caller allocates no junk rows) never
    # appears in a descriptor.
    def drain(slot, carry):
        bit = jax.lax.shift_left(jnp.int32(1), slot)

        @pl.when((carry & bit) != 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot], tout_ref.at[pl.ds(0, 1)],
                w_sems.at[slot]).wait()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), drain, outstanding)


def apply_row_updates(table_packed, ids, g_packed, lr, d: int,
                      kind: str = "adagrad", eps: float = 1e-8,
                      skip_ge: int | None = None,
                      interpret: bool = False) -> jax.Array:
    """In-place fused row optimizer.

    table_packed [V, 128] f32 (w | acc | pad), ids [n] int32 — PAIRWISE
    DISTINCT and in-bounds (dedup + junk-pad-row mapping is the caller's
    job, parallel/scanned.py), g_packed [n, 128] f32 (g | ‖g‖² | 0), `d`
    the weight width (< 128). Returns the updated table (the input buffer
    is aliased in place).

    skip_ge: rows with ids[j] >= skip_ge are skipped entirely (no DMA
    pair). Correct whenever those rows carry exact-zero g (their RMW is
    the identity) — true for the dedup pipeline's junk targets, which are
    all >= the real vocab (ops/segsum.py).

    On non-TPU backends routes to the identical-math jnp fallback unless
    interpret=True forces the emulated Pallas path (kernel unit tests).
    """
    if not 0 < d < LANES:
        raise ValueError(f"packed row optimizer requires 0 < D < {LANES}")
    if not interpret and jax.default_backend() != "tpu":
        return _apply_row_updates_jnp(table_packed, ids, g_packed, lr,
                                      kind, eps, d, skip_ge)
    n = ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    grid = (n // r,)
    return pl.pallas_call(
        functools.partial(_kernel, d=d, kind=kind, eps=eps, n_rows=r,
                          skip_ge=skip_ge),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # table in (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # table out (aliased)
        out_shape=jax.ShapeDtypeStruct(table_packed.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ids, jnp.asarray(lr, jnp.float32).reshape(1, 1), g_packed,
      table_packed)


def _apply_row_updates_jnp(table_packed, ids, g_packed, lr, kind, eps,
                           d: int = 64, skip_ge: int | None = None):
    """Reference/fallback path (CPU, tests): identical math via one
    unique-row scatter. Requires the same pairwise-distinct ids.

    skip_ge matches the TPU kernel's semantics: rows with id >= skip_ge are
    untouched and may be OUT OF BOUNDS of the table (reads clamp, writes
    drop) — so fused-mode callers need no junk pad rows on any backend."""
    lane = jnp.arange(LANES)
    m_w = (lane < d).astype(jnp.float32)
    m_acc = (lane == d).astype(jnp.float32)
    read_ids = jnp.minimum(ids, table_packed.shape[0] - 1)
    r = jnp.take(table_packed, read_ids, axis=0)
    if kind == "adagrad":
        r_acc = r + g_packed * m_acc
        acc = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(acc + eps)
        new = r_acc - scale * (g_packed * m_w)
    else:
        new = r - jnp.asarray(lr, jnp.float32) * (g_packed * m_w)
    if skip_ge is not None:
        new = jnp.where((ids < skip_ge)[:, None], new, r)
        return table_packed.at[ids].set(new, mode="drop",
                                        unique_indices=True)
    return table_packed.at[ids].set(new, mode="promise_in_bounds",
                                    unique_indices=True)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("d",))
def _pack_into(packed, weights, acc, d):
    packed = packed.at[:, :d].set(weights)
    return packed.at[:, d].set(acc)


def pack_table(weights: jax.Array, acc: jax.Array | None = None
               ) -> jax.Array:
    """[V, D] weights (+ optional [V] adagrad acc) → packed [V, 128].

    Built with lane-slice updates inside one jitted call with the zero
    buffer donated — NOT concatenate (a concatenated [V, 1] accumulator
    column pads 128× under the (8, 128) tile layout: 5.8GB at V=12.2M) and
    NOT eager sets (no aliasing outside jit: +6.2GB at bench scale; both
    variants OOM'd the 16GB chip, measured)."""
    v, d = weights.shape
    if acc is None:
        acc = jnp.zeros((v,), jnp.float32)
    packed = jnp.zeros((v, LANES), jnp.float32)
    return _pack_into(packed, weights.astype(jnp.float32),
                      acc.astype(jnp.float32), d)


def unpack_table(table_packed: jax.Array, d: int):
    """packed [V, 128] → ([V, D] weights, [V] acc)."""
    return table_packed[:, :d], table_packed[:, d]


_END = 1 << 30
_CSUM_ID_MASK = _END - 1


def pack_end_meta(s_ids: jax.Array) -> jax.Array:
    """SORTED ids [n] int32 → (id | run_end << 30) stream for the csum
    kernel. Vocab cap 2^30 − 2."""
    end = jnp.concatenate([s_ids[1:] != s_ids[:-1], jnp.ones((1,), bool)])
    return (s_ids | jnp.where(end, _END, 0)).astype(jnp.int32)


def _csum_kernel(meta_ref, lr_ref, c_ref, tin_ref, tout_ref,
                 rbuf, wbuf, prev_c, r_sems, w_sems, *, d: int, kind: str,
                 eps: float, n_rows: int, skip_ge: int):
    """Diff-mode fused optimizer: c_ref holds the BLOCKWISE-GLOBAL
    inclusive cumsum of the sorted row gradients; each run's summed
    gradient is c[end_k] − c[end_{k−1}], tracked via the prev_c VMEM
    register (persists across grid blocks; reset at block 0). Junk/pad
    positions (id >= skip_ge) are skipped at the DMA level AND never
    update prev_c — their cumsum rows pass through untouched, which is
    exact because their gradient rows are zero. This deletes the XLA-side
    boundary gather / cummax / where-zeroing / pack_grads of the v1 dedup
    front-end (BENCH_NOTES r3: 18.8 + 4.6 ms per 540k-row batch)."""
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    m_acc = (lane == d).astype(jnp.float32)
    lr = lr_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        prev_c[...] = jnp.zeros((1, d), jnp.float32)

    def parts(j):
        meta = meta_ref[j]
        idv = meta & _CSUM_ID_MASK
        return idv, (idv < skip_ge) & ((meta & _END) != 0)

    def read_dma(j):
        slot = j % RING
        return pltpu.make_async_copy(
            tin_ref.at[pl.ds(parts(j)[0], 1)], rbuf.at[slot],
            r_sems.at[slot])

    def write_dma(j):
        slot = j % RING
        return pltpu.make_async_copy(
            wbuf.at[slot], tout_ref.at[pl.ds(parts(j)[0], 1)],
            w_sems.at[slot])

    def warm(t, carry):
        @pl.when(parts(t)[1])
        def _():
            read_dma(t).start()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), warm, 0)

    def body(j, outstanding):
        slot = j % RING
        bit = jax.lax.shift_left(jnp.int32(1), slot)
        real = parts(j)[1]

        @pl.when(real)
        def _compute():
            @pl.when((outstanding & bit) != 0)
            def _wait_prev_write():
                write_dma(j).wait()

            read_dma(j).wait()
            r = rbuf[slot]                        # (1, 128): w | acc | pad
            cur = c_ref[pl.ds(j, 1), :]           # (1, d) cumsum row
            diff = cur - prev_c[...]              # Σ g over this run
            prev_c[...] = cur
            if kind == "adagrad":
                nsq = jnp.sum(diff * diff, axis=1, keepdims=True)
                r_acc = r + nsq * m_acc           # acc' in lane d
                av = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
                scale = lr * jax.lax.rsqrt(av + eps)
                wbuf[slot] = r_acc
                wbuf[slot, 0:1, 0:d] = r_acc[0:1, 0:d] - scale * diff
            else:
                wbuf[slot] = r
                wbuf[slot, 0:1, 0:d] = r[0:1, 0:d] - lr * diff
            write_dma(j).start()

        @pl.when((j + RING < n_rows) & parts(j + RING)[1])
        def _start_next_read():
            read_dma(j + RING).start()

        return jnp.where(real, outstanding | bit, outstanding)

    outstanding = jax.lax.fori_loop(0, n_rows, body, jnp.int32(0))

    def drain(slot, carry):
        bit = jax.lax.shift_left(jnp.int32(1), slot)

        @pl.when((carry & bit) != 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot], tout_ref.at[pl.ds(0, 1)],
                w_sems.at[slot]).wait()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), drain, outstanding)


def apply_csum_updates(table_packed, s_ids, c_rows, lr, d: int,
                       kind: str = "adagrad", eps: float = 1e-8,
                       skip_ge: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Diff-mode fused optimizer (see _csum_kernel).

    table_packed [V, 128] f32 (w | acc | pad); s_ids [n] int32 SORTED
    (duplicates fine — only run ends act); c_rows [n, d] f32 = the
    inclusive cumsum over the sorted (zero-for-pad) gradient rows
    (ops/segsum._cumsum_rows). Rows with id >= skip_ge (default V) are
    skipped; the table needs NO junk rows. n must be a multiple of 1024.
    """
    v = table_packed.shape[0]
    if skip_ge is None:
        skip_ge = v
    if not 0 < d < LANES:
        raise ValueError(f"csum optimizer requires 0 < d < {LANES}")
    if skip_ge > _CSUM_ID_MASK - 1:
        raise ValueError(f"vocab {skip_ge} exceeds id cap {_CSUM_ID_MASK}")
    if not interpret and jax.default_backend() != "tpu":
        return _apply_csum_updates_jnp(table_packed, s_ids, c_rows, lr,
                                       kind, eps, d, skip_ge)
    n = s_ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    meta = pack_end_meta(s_ids)
    return pl.pallas_call(
        functools.partial(_csum_kernel, d=d, kind=kind, eps=eps, n_rows=r,
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
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table_packed.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),          # prev_c register
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(meta, jnp.asarray(lr, jnp.float32).reshape(1, 1),
      c_rows.astype(jnp.float32), table_packed)


def _apply_csum_updates_jnp(table_packed, s_ids, c_rows, lr, kind, eps,
                            d: int, skip_ge: int):
    """Fallback: recover per-run sums from the cumsum diffs of CONSECUTIVE
    REAL RUN ENDS (same math as the kernel's prev_c register), then one
    unique-row update."""
    n = s_ids.shape[0]
    is_end = jnp.concatenate(
        [s_ids[1:] != s_ids[:-1], jnp.ones((1,), bool)])
    real = is_end & (s_ids < skip_ge)
    # previous real end's position per row: shifted cummax (-1 = none)
    pos = jnp.arange(n, dtype=jnp.int32)
    prev_end = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         jax.lax.cummax(jnp.where(real, pos, -1))[:-1]])
    prev_c = jnp.where(
        (prev_end >= 0)[:, None],
        jnp.take(c_rows, jnp.maximum(prev_end, 0), axis=0), 0.0)
    rows = jnp.where(real[:, None], c_rows - prev_c, 0.0)
    v = table_packed.shape[0]
    safe = jnp.where(real, s_ids, v)
    cur = jnp.take(table_packed, jnp.where(real, s_ids, 0), axis=0)
    nsq = jnp.sum(rows * rows, axis=1, keepdims=True)
    lane = jnp.arange(LANES)
    m_w = (lane < d).astype(jnp.float32)
    m_acc = (lane == d).astype(jnp.float32)
    rows_p = jnp.zeros((n, LANES), jnp.float32).at[:, :d].set(rows)
    if kind == "adagrad":
        r_acc = cur + nsq * m_acc
        av = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(av + eps)
        new = r_acc - scale * (rows_p * m_w)
    else:
        new = cur - jnp.asarray(lr, jnp.float32) * (rows_p * m_w)
    new = jnp.where(real[:, None], new, cur)
    return table_packed.at[safe].set(new, mode="drop")


# --------------------------------------------------------- grouped lines ---
# BASELINE config #5 is a 100M-row × dim-16 table: the one-row-per-128-lane
# layout above would spend 51 GB for a nominal 6.4 GB of weights. The
# grouped layout packs G = 128 // (D+1) (w | acc) row-groups per line
# (D=16 → G=7, 7.3 GB at 100M rows; D=64 → G=1, identical to the classic
# layout). Updates arrive as line-aligned lane-placed sums (the caller
# accumulates row duplicates AND same-line rows — see
# parallel/scanned.py's grouped fused branch), and the kernel applies
# per-group adagrad by spreading each group's accumulator lane across its
# weight lanes with one (1,128)x(128,128) MXU matmul per line.

def group_size(d: int) -> int:
    """Rows per 128-lane line in the grouped fused layout."""
    return max(1, LANES // (d + 1))


def make_spread(d: int) -> jax.Array:
    """[128, 128] f32: spread[i, j] = 1 iff i is the accumulator lane of
    the group that owns weight lane j — (acc_vals @ spread)[j] = that
    group's accumulator, 0 on non-weight lanes."""
    g = group_size(d)
    stride = d + 1
    m = np.zeros((LANES, LANES), np.float32)
    for grp in range(g):
        m[grp * stride + d, grp * stride:grp * stride + d] = 1.0
    return jnp.asarray(m)


def packed_lines(vocab: int, d: int) -> int:
    return -(-vocab // group_size(d))


def _group_select(d: int):
    """([g*d, 128] w-placement, [g, 128] acc-placement) 0/1 matrices:
    row-major (group, dim) weight j lands on lane group*(d+1)+dim, group
    g's acc on lane g*(d+1)+d. Lane placement as MXU matmuls — narrow
    [L, g, d+1] reshape intermediates tile-pad their minor dims to 128
    lanes (an 8-18x transient; 117 GB at 100M x 16, measured OOM)."""
    g = group_size(d)
    sel_w = np.zeros((g * d, LANES), np.float32)
    sel_a = np.zeros((g, LANES), np.float32)
    for grp in range(g):
        for j in range(d):
            sel_w[grp * d + j, grp * (d + 1) + j] = 1.0
        sel_a[grp, grp * (d + 1) + d] = 1.0
    return jnp.asarray(sel_w), jnp.asarray(sel_a)


def pack_table_grouped(weights: jax.Array, acc: jax.Array | None = None
                       ) -> jax.Array:
    """[V, D] (+ [V] acc) → [ceil(V/G), 128] grouped lines."""
    v, d = weights.shape
    g = group_size(d)
    if g == 1:
        return pack_table(weights, acc)
    if acc is None:
        acc = jnp.zeros((v,), jnp.float32)
    lines = packed_lines(v, d)
    pad = lines * g - v
    if pad:
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad, d), weights.dtype)])
        acc = jnp.concatenate([acc, jnp.zeros((pad,), acc.dtype)])
    sel_w, sel_a = _group_select(d)
    wr = weights.reshape(lines, g * d).astype(jnp.float32)
    ar = acc.reshape(lines, g).astype(jnp.float32)
    return (jnp.dot(wr, sel_w, preferred_element_type=jnp.float32)
            + jnp.dot(ar, sel_a, preferred_element_type=jnp.float32))


def unpack_table_grouped(table_lines: jax.Array, vocab: int, d: int):
    """grouped [L, 128] → ([vocab, D] weights, [vocab] acc). Lane
    extraction via the transposed placement matmuls (see _group_select).
    CAUTION: the [vocab, D] output itself tile-pads to 128 lanes on
    device — at very large vocab unpack on HOST instead
    (unpack_table_grouped_np)."""
    g = group_size(d)
    if g == 1:
        w, acc = unpack_table(table_lines, d)
        return w[:vocab], acc[:vocab]
    lines = table_lines.shape[0]
    sel_w, sel_a = _group_select(d)
    w = jnp.dot(table_lines, sel_w.T,
                preferred_element_type=jnp.float32)      # [L, g*d]
    acc = jnp.dot(table_lines, sel_a.T,
                  preferred_element_type=jnp.float32)    # [L, g]
    return (w.reshape(lines * g, d)[:vocab],
            acc.reshape(lines * g)[:vocab])


def unpack_table_grouped_np(table_lines: np.ndarray, vocab: int, d: int):
    """Host (numpy) unpack — no tiling, no device allocations; the export
    path for very large grouped tables (a [100M, 16] f32 DEVICE array
    occupies 51 GB under (8,128) lane tiling)."""
    g = group_size(d)
    lines = table_lines.shape[0]
    arr = np.asarray(table_lines)[:, :g * (d + 1)].reshape(lines, g, d + 1)
    w = arr[:, :, :d].reshape(lines * g, d)[:vocab]
    acc = np.ascontiguousarray(arr[:, :, d].reshape(lines * g)[:vocab])
    return w, acc


@functools.partial(jax.jit,
                   static_argnames=("vocab", "d", "scale", "lines"))
def init_packed_table_grouped(key: jax.Array, vocab: int, d: int,
                              scale: float = 0.01,
                              lines: int | None = None) -> jax.Array:
    """Fresh grouped table without materializing the [V, D] intermediate.
    Jitted as ONE program: run eagerly, the noise draw + lane mask + tail
    zeroing each materialize a table-sized buffer (3 x 7.3 GB at
    100M x 16 — measured RESOURCE_EXHAUSTED); fused, the only allocation
    is the output. `lines` overrides the line count (>= ceil(vocab/G)) so
    sharded callers can pad to a model-axis multiple; rows past `vocab`
    stay zero either way."""
    g = group_size(d)
    if lines is None:
        lines = packed_lines(vocab, d)
    stride = d + 1
    lane = jnp.arange(LANES)
    within = lane < g * stride
    is_w = within & ((lane % stride) < d)
    # zero weight lanes of the tail rows past the vocab (pad groups in the
    # last line); rows are fully determined by (line, lane) so this is one
    # fused mask, not a post-hoc row patch
    grp_of_lane = jnp.minimum(lane // stride, g - 1)
    row_of = (jnp.arange(lines, dtype=jnp.int32)[:, None] * g
              + grp_of_lane[None, :].astype(jnp.int32))
    live = is_w[None, :] & (row_of < vocab)
    noise = jax.random.normal(key, (lines, LANES), jnp.float32) * scale
    return jnp.where(live, noise, 0.0)


def _gline_kernel(ids_ref, lr_ref, g_ref, spread_ref, tin_ref, tout_ref,
                  rbuf, wbuf, r_sems, w_sems, *, d: int, kind: str,
                  eps: float, n_rows: int, skip_ge: int):
    """Grouped-line RMW: like _kernel but each 128-lane line carries G
    (w | acc) groups; g_ref rows arrive lane-placed and line-accumulated
    (w-lane gradient sums + acc-lane ||.||^2 per touched group); adagrad
    scales spread per group via one MXU matmul."""
    g = group_size(d)
    stride = d + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    within = lane < g * stride
    m_w = (within & (lane % stride < d)).astype(jnp.float32)
    m_acc = (within & (lane % stride == d)).astype(jnp.float32)
    lr = lr_ref[0, 0]

    def is_real(j):
        return ids_ref[j] < skip_ge

    def read_dma(j):
        slot = j % RING
        return pltpu.make_async_copy(
            tin_ref.at[pl.ds(ids_ref[j], 1)], rbuf.at[slot], r_sems.at[slot])

    def write_dma(j):
        slot = j % RING
        return pltpu.make_async_copy(
            wbuf.at[slot], tout_ref.at[pl.ds(ids_ref[j], 1)],
            w_sems.at[slot])

    def warm(t, carry):
        @pl.when(is_real(t))
        def _():
            read_dma(t).start()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), warm, 0)

    def body(j, outstanding):
        slot = j % RING
        bit = jax.lax.shift_left(jnp.int32(1), slot)
        real = is_real(j)

        @pl.when(real)
        def _compute():
            @pl.when((outstanding & bit) != 0)
            def _wait_prev_write():
                write_dma(j).wait()

            read_dma(j).wait()
            r = rbuf[slot]                       # (1, 128) line
            gp = g_ref[pl.ds(j, 1), :]           # (1, 128) lane-placed sums
            if kind == "adagrad":
                r_acc = r + gp * m_acc
                spread_acc = jnp.dot(
                    r_acc * m_acc, spread_ref[...],
                    preferred_element_type=jnp.float32)   # (1, 128)
                scale = lr * jax.lax.rsqrt(spread_acc + eps)
                wbuf[slot] = r_acc - scale * (gp * m_w)
            else:
                wbuf[slot] = r - lr * (gp * m_w)
            write_dma(j).start()

        @pl.when((j + RING < n_rows) & is_real(j + RING))
        def _start_next_read():
            read_dma(j + RING).start()

        return jnp.where(real, outstanding | bit, outstanding)

    outstanding = jax.lax.fori_loop(0, n_rows, body, jnp.int32(0))

    def drain(slot, carry):
        bit = jax.lax.shift_left(jnp.int32(1), slot)

        @pl.when((carry & bit) != 0)
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot], tout_ref.at[pl.ds(0, 1)],
                w_sems.at[slot]).wait()
        return carry

    jax.lax.fori_loop(0, min(RING, n_rows), drain, outstanding)


def apply_line_updates(table_lines, line_ids, line_updates, lr, d: int,
                       kind: str = "adagrad", eps: float = 1e-8,
                       skip_ge: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Grouped-line fused optimizer.

    table_lines [L, 128] (pack_table_grouped layout); line_ids [n] int32
    PAIRWISE DISTINCT (same-line updates pre-accumulated by the caller);
    line_updates [n, 128] lane-placed accumulated updates (w lanes carry
    gradient sums, each group's acc lane carries its ||sum||^2). Lines with
    id >= skip_ge (default L) are skipped at the DMA level / dropped by the
    fallback — junk ids may point past the table. n must be a multiple of
    ROWS_PER_STEP."""
    if skip_ge is None:
        skip_ge = table_lines.shape[0]
    if not 0 < d < LANES:
        raise ValueError(f"grouped optimizer requires 0 < d < {LANES}")
    spread = make_spread(d)
    if not interpret and jax.default_backend() != "tpu":
        return _apply_line_updates_jnp(table_lines, line_ids, line_updates,
                                       spread, lr, kind, eps, d, skip_ge)
    n = line_ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    return pl.pallas_call(
        functools.partial(_gline_kernel, d=d, kind=kind, eps=eps, n_rows=r,
                          skip_ge=skip_ge),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # table in (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table_lines.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.VMEM((RING, 1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(line_ids, jnp.asarray(lr, jnp.float32).reshape(1, 1), line_updates,
      spread, table_lines)


def _apply_line_updates_jnp(table_lines, line_ids, line_updates, spread,
                            lr, kind, eps, d: int, skip_ge: int):
    """Fallback: identical per-group math via one unique-row scatter;
    out-of-bounds / junk line ids are dropped."""
    g = group_size(d)
    stride = d + 1
    lane = jnp.arange(LANES)
    within = lane < g * stride
    m_w = (within & (lane % stride < d)).astype(jnp.float32)
    m_acc = (within & (lane % stride == d)).astype(jnp.float32)
    read_ids = jnp.minimum(line_ids, table_lines.shape[0] - 1)
    r = jnp.take(table_lines, read_ids, axis=0)
    if kind == "adagrad":
        r_acc = r + line_updates * m_acc
        spread_acc = (r_acc * m_acc) @ spread
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(
            spread_acc + eps)
        new = r_acc - scale * (line_updates * m_w)
    else:
        new = r - jnp.asarray(lr, jnp.float32) * (line_updates * m_w)
    new = jnp.where((line_ids < skip_ge)[:, None], new, r)
    return table_lines.at[line_ids].set(new, mode="drop",
                                        unique_indices=True)


# ------------------------------------------------------- split RMW (r5) ---
# The fused RMW kernel above is scalar-core DMA-ISSUE bound (~122 ns per
# row for the read+write pair + ring sync, 8.2M rows/s measured r3). XLA's
# fixed-function row gather reads the same rows at 57M rows/s (take,
# BENCH_NOTES r3) — so the r5 split mode reads the current rows with ONE
# jnp.take, does the adagrad math as plain vectorized XLA, and uses Pallas
# only for what XLA cannot do fast: the scattered row WRITE-BACK. The
# write-only kernel issues a single DMA per row (~half the issue work of
# the RMW pair), with the whole [R, 128] source block already pipelined
# into VMEM by the BlockSpec machinery.

W_RING = 16


def _scatter_kernel(ids_ref, rows_ref, tin_ref, tout_ref, w_sems, *,
                    n_rows: int, skip_ge: int):
    """Write rows_ref[j] → tout_ref[ids_ref[j]] for every real row of the
    block. ids are pairwise distinct; ids >= skip_ge are skipped (may be
    out of bounds). tin aliases tout so untouched rows persist."""
    def wdma(j):
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(j, 1)], tout_ref.at[pl.ds(ids_ref[j], 1)],
            w_sems.at[j % W_RING])

    def body(j, outstanding):
        slot = j % W_RING
        bit = jax.lax.shift_left(jnp.int32(1), slot)
        real = ids_ref[j] < skip_ge

        @pl.when(real)
        def _():
            @pl.when((outstanding & bit) != 0)
            def _wait_slot():
                wdma(j).wait()          # drain previous copy on this slot
            wdma(j).start()

        return jnp.where(real, outstanding | bit, outstanding)

    outstanding = jax.lax.fori_loop(0, n_rows, body, jnp.int32(0))

    def drain(slot, carry):
        bit = jax.lax.shift_left(jnp.int32(1), slot)

        @pl.when((carry & bit) != 0)
        def _():
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(0, 1)], tout_ref.at[pl.ds(0, 1)],
                w_sems.at[slot]).wait()   # descriptor shape-only (1, 128)
        return carry

    jax.lax.fori_loop(0, min(W_RING, n_rows), drain, outstanding)


def scatter_rows_packed(table_packed, ids, new_rows,
                        skip_ge: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """table[ids[j]] = new_rows[j] for pairwise-distinct ids (< skip_ge);
    rows with ids >= skip_ge are skipped (ids may point past the table).
    The table buffer is aliased in place. new_rows [n, 128] f32."""
    if skip_ge is None:
        skip_ge = table_packed.shape[0]
    if not interpret and jax.default_backend() != "tpu":
        # junk ids route out of bounds → dropped by mode="drop"
        safe = jnp.where(ids < skip_ge, ids, table_packed.shape[0])
        return table_packed.at[safe].set(new_rows, mode="drop",
                                         unique_indices=True)
    n = ids.shape[0]
    r = min(ROWS_PER_STEP, n)
    if n % r:
        raise ValueError(f"n={n} must be a multiple of {r}")
    return pl.pallas_call(
        functools.partial(_scatter_kernel, n_rows=r, skip_ge=skip_ge),
        grid=(n // r,),
        in_specs=[
            pl.BlockSpec((r,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((r, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # table in (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(table_packed.shape, jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W_RING,))],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(ids, new_rows, table_packed)


def apply_row_updates_split(table_packed, ids, g_packed, lr, d: int,
                            kind: str = "adagrad", eps: float = 1e-8,
                            skip_ge: int | None = None,
                            interpret: bool = False) -> jax.Array:
    """Split-mode fused optimizer: identical math to apply_row_updates,
    executed as take-read (XLA fast gather) + vectorized row math + the
    write-only Pallas scatter. Wins whenever the RMW kernel is DMA-issue
    bound (measured: see BENCH_NOTES r5)."""
    v = table_packed.shape[0]
    if skip_ge is None:
        skip_ge = v
    lane = jnp.arange(LANES)
    m_w = (lane < d).astype(jnp.float32)
    m_acc = (lane == d).astype(jnp.float32)
    read_ids = jnp.minimum(ids, v - 1)
    cur = jnp.take(table_packed, read_ids, axis=0)        # [n, 128]
    if kind == "adagrad":
        r_acc = cur + g_packed * m_acc
        acc = jnp.sum(r_acc * m_acc, axis=1, keepdims=True)
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(acc + eps)
        new = r_acc - scale * (g_packed * m_w)
    else:
        new = cur - jnp.asarray(lr, jnp.float32) * (g_packed * m_w)
    return scatter_rows_packed(table_packed, ids, new, skip_ge=skip_ge,
                               interpret=interpret)


def apply_line_updates_split(table_lines, line_ids, line_updates, lr,
                             d: int, kind: str = "adagrad",
                             eps: float = 1e-8,
                             skip_ge: int | None = None,
                             interpret: bool = False) -> jax.Array:
    """Split-mode grouped-line optimizer: identical per-group math to
    apply_line_updates, executed as take-read + vectorized XLA math + the
    write-only Pallas scatter (the same 2.04× DMA-issue win as
    apply_row_updates_split — one DMA per line instead of a RMW pair)."""
    L = table_lines.shape[0]
    if skip_ge is None:
        skip_ge = L
    g = group_size(d)
    stride = d + 1
    lane = jnp.arange(LANES)
    within = lane < g * stride
    m_w = (within & (lane % stride < d)).astype(jnp.float32)
    m_acc = (within & (lane % stride == d)).astype(jnp.float32)
    read_ids = jnp.minimum(line_ids, L - 1)
    cur = jnp.take(table_lines, read_ids, axis=0)          # [n, 128]
    if kind == "adagrad":
        spread = make_spread(d)
        r_acc = cur + line_updates * m_acc
        spread_acc = jnp.dot(r_acc * m_acc, spread,
                             preferred_element_type=jnp.float32)
        scale = jnp.asarray(lr, jnp.float32) * jax.lax.rsqrt(
            spread_acc + eps)
        new = r_acc - scale * (line_updates * m_w)
    else:
        new = cur - jnp.asarray(lr, jnp.float32) * (line_updates * m_w)
    return scatter_rows_packed(table_lines, line_ids, new,
                               skip_ge=skip_ge, interpret=interpret)


def pack_grads(g: jax.Array) -> jax.Array:
    """[n, D] row gradients → [n, 128] (g | ‖g‖² | 0) update rows.
    Lane-slice updates for the same tiling reason as pack_table."""
    n, d = g.shape
    gp = jnp.zeros((n, LANES), g.dtype)
    gp = gp.at[:, :d].set(g)
    gp = gp.at[:, d].set(jnp.sum(g * g, axis=1))
    return gp.astype(jnp.float32)
