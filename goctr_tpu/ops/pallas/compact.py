"""Block-compaction kernel: sorted run sums → compacted (id, Σg) stream.

The r4 fused+compact front-end spends, at the headline batch (n=2,162,688
update rows), ~52 ms of XLA stages AFTER the id sort + row permute:
blockwise cumsum (14), compaction rank-sort (21), run-end gathers + diff
(14), grad pack (3) — measured in BENCH_NOTES r5. This kernel fuses all
of them into one pass over the sorted gradient rows:

  per 512-row block (sequential grid — TPU grid steps execute in order):
    * block-LOCAL cumsum of the gradient rows in VMEM (better numerics
      than the r4 global-cumsum diff: cancellation is bounded by the
      block, and cross-block runs use a running-sum register, never a
      global-magnitude subtraction);
    * run-end selection WITHOUT gathers: rank = cumsum(end flags); the
      0/1 matrix P[k, j] = (rank[j] == k+1 ∧ end[j]) copies the k-th
      end's cumsum row and its id (an appended f32 column) with ONE MXU
      matmul — each P row has exactly one 1, so every copy is exact;
    * consecutive-end diffs (the run sums), ‖Σg‖² in lane D, the run's id
      in lane D+1 → a pack-ready [512, 128] block;
    * per-block COMPACT prefix layout: block i's cnt_i real runs land at
      rows [i·512, i·512+cnt_i) of the position-aligned output.

  A cheap XLA stitch (per-block counts → offsets → one [cap] gather)
  produces the final compacted (tgt, packed rows) the row optimizer
  consumes. ids ride through the f32 matmul, so vocab must be < 2^24
  (f32-exact integers); larger vocabs use the XLA rank-sort path.

Mosaic layout notes: run-end flags and ids travel as two EXTRA LANES of
the gradient array ([n, D+2]; physically free — a [n, 64] f32 array
already lane-pads to 128), because Mosaic rejects (1, BLK) block shapes
for a separate [nb, BLK] input; 1-column views transpose to lane vectors
in-kernel for the rank/selection compares.

Reference note: no counterpart exists in the Go reference (its embedding
table is a frozen map, rcmd.go:501-531); this is pure TPU-side design.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLK = 512                   # rows per grid step (P matrix: 1 MB f32 VMEM)


def _kernel(aug_ref, rows_ref, open_sum, *, d: int, blk: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        open_sum[...] = jnp.zeros((1, d), jnp.float32)

    aug = aug_ref[...]                                   # [blk, d+2]
    ids_c = aug[:, d + 1:d + 2]                          # [blk, 1] f32 ids
    # cumsums via a lower-triangular MXU matmul (Mosaic has no cumsum
    # lowering): C[:, :d] = running gradient sums, C[:, d] = end-flag rank
    row_i = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    L = jnp.where(row_i >= col_i, 1.0, 0.0)
    C = jnp.dot(L, aug[:, :d + 1], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    local_c = C[:, :d]
    rank_c = C[:, d:d + 1]                               # [blk, 1]
    cnt = rank_c[blk - 1, 0]
    rank_r = jnp.transpose(rank_c, (1, 0))               # [1, blk]
    flags_r = jnp.transpose(aug[:, d:d + 1], (1, 0))
    kk = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) \
        .astype(jnp.float32)
    P = jnp.where((rank_r == kk + 1.0) & (flags_r > 0.0), 1.0, 0.0)
    X = jnp.concatenate([local_c, ids_c], axis=1)        # [blk, d+1]
    sel = jnp.dot(P, X, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    c_sel = sel[:, :d]
    ids_sel = sel[:, d:d + 1]                            # [blk, 1]
    shifted = jnp.concatenate([-open_sum[...], c_sel[:-1]], axis=0)
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) \
        .astype(jnp.float32)
    valid = rows_k < cnt
    diff = jnp.where(valid, c_sel - shifted, 0.0)
    nsq = jnp.sum(diff * diff, axis=1, keepdims=True)
    out = jnp.concatenate(
        [diff, jnp.where(valid, nsq, 0.0), jnp.where(valid, ids_sel, 0.0),
         jnp.zeros((blk, LANES - d - 2), jnp.float32)], axis=1)
    rows_ref[...] = out

    # running sum of the still-open run (rows after the block's last end)
    total = local_c[blk - 1:, :]                         # [1, d]
    last_c = jnp.sum(jnp.where(rows_k == cnt - 1.0, c_sel, 0.0),
                     axis=0, keepdims=True)
    open_sum[...] = jnp.where(cnt > 0, total - last_c,
                              open_sum[...] + total)


def compact_runsums_block(s_ids: jax.Array, g_sorted: jax.Array,
                          vocab: int, capr: int,
                          interpret: bool = False):
    """SORTED ids [n] int32 (pads/junk = `vocab`, sorted last) + matching
    gradient rows [n, d] → (tgt [capr] int32, rows_packed [capr, 128],
    overflow []) with tgt pairwise distinct, junk slots ≥ vocab+1, and
    rows_packed = (Σg | ‖Σg‖² | 0 | 0-pad) per unique id. Requires
    n % 512 == 0, d < 127, vocab < 2^24 (ids ride an f32 matmul). Run
    ends beyond capr DROP their update; overflow counts them."""
    n, d = g_sorted.shape
    if n % BLK:
        raise ValueError(f"n={n} must be a multiple of {BLK}")
    if vocab >= (1 << 24):
        raise ValueError("compact kernel requires vocab < 2^24 "
                         "(f32-exact ids); use the XLA rank-sort path")
    if d >= LANES - 1:
        raise ValueError("compact kernel requires d < 127")
    nb = n // BLK
    is_end = jnp.concatenate([s_ids[1:] != s_ids[:-1],
                              jnp.ones((1,), bool)])
    real_end = is_end & (s_ids < vocab)
    # flags + ids as two extra lanes (physically free under 128-lane tiling)
    aug = jnp.zeros((n, d + 2), jnp.float32)
    aug = aug.at[:, :d].set(g_sorted.astype(jnp.float32))
    aug = aug.at[:, d].set(real_end.astype(jnp.float32))
    aug = aug.at[:, d + 1].set(s_ids.astype(jnp.float32))
    cnts = jnp.sum(real_end.reshape(nb, BLK).astype(jnp.int32), axis=1)
    offs = jnp.cumsum(cnts)                                # inclusive
    total = offs[-1]

    if interpret or jax.default_backend() == "tpu":
        out_rows = pl.pallas_call(
            functools.partial(_kernel, d=d, blk=BLK),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((BLK, d + 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(aug)
    else:
        out_rows = _fallback(aug, d, nb)

    # ---- stitch: per-block compact prefixes → one [capr] gather ---------
    k = jnp.arange(capr, dtype=jnp.int32)
    blk_of = jnp.searchsorted(offs, k, side="right").astype(jnp.int32)
    blk_c = jnp.minimum(blk_of, nb - 1)
    j = k - (jnp.take(offs, blk_c) - jnp.take(cnts, blk_c))
    src = blk_c * BLK + jnp.clip(j, 0, BLK - 1)
    ok = k < total
    rows_packed = jnp.take(out_rows, src, axis=0)
    rows_packed = jnp.where(ok[:, None], rows_packed, 0.0)
    tgt = jnp.where(ok, rows_packed[:, d + 1].astype(jnp.int32),
                    vocab + 1 + k)
    rows_packed = rows_packed.at[:, d + 1].set(0.0)     # pack contract
    overflow = jnp.maximum(total - capr, 0)
    return tgt, rows_packed, overflow


def _fallback(aug, d: int, nb: int):
    """jnp reference of the kernel (CPU tests): identical per-block math,
    vectorized over blocks with a lax.scan carry for the open run."""
    n = aug.shape[0]
    blk = n // nb
    g = aug[:, :d].reshape(nb, blk, d)
    ends2 = aug[:, d].reshape(nb, blk)
    sids2 = aug[:, d + 1].reshape(nb, blk)
    local_c = jnp.cumsum(g, axis=1)
    rank = jnp.cumsum(ends2, axis=1)
    cnt = rank[:, -1]
    kk = jnp.arange(blk, dtype=jnp.float32)
    P = jnp.where((rank[:, None, :] == kk[None, :, None] + 1.0)
                  & (ends2[:, None, :] > 0.0), 1.0, 0.0)   # [nb, blk, blk]
    X = jnp.concatenate([local_c, sids2[..., None]], axis=2)
    sel = jnp.einsum("bkj,bjd->bkd", P, X)
    c_sel, ids_sel = sel[..., :d], sel[..., d]
    total = local_c[:, -1, :]
    valid = kk[None, :] < cnt[:, None]
    last_c = jnp.sum(jnp.where(
        (kk[None, :, None] == (cnt[:, None, None] - 1.0)), c_sel, 0.0),
        axis=1)

    def step(open_sum, xs):
        c_sel_b, tot_b, last_b, cnt_b = xs
        shifted = jnp.concatenate([-open_sum[None, :], c_sel_b[:-1]], axis=0)
        diff_b = c_sel_b - shifted
        new_open = jnp.where(cnt_b > 0, tot_b - last_b, open_sum + tot_b)
        return new_open, diff_b

    _, diffs = jax.lax.scan(step, jnp.zeros((d,), jnp.float32),
                            (c_sel, total, last_c, cnt))
    diffs = jnp.where(valid[..., None], diffs, 0.0)
    nsq = jnp.sum(diffs * diffs, axis=2, keepdims=True)
    out = jnp.concatenate(
        [diffs, jnp.where(valid[..., None], nsq, 0.0),
         jnp.where(valid[..., None], ids_sel[..., None], 0.0),
         jnp.zeros((nb, blk, LANES - d - 2), jnp.float32)], axis=2)
    return out.reshape(nb * blk, LANES)
