"""Blockwise DIN attention-pool Pallas kernel.

Computes, in one pass over the sequence axis (reference semantics
din.go:231-298):
    w_t   = (cos(behavior_t, item) + 1) / 2
    gate  = sigmoid(w_t * att0_t) * mask_t
    out   = Σ_t gate_t · behavior_t / Σ_t mask_t     (mean over valid steps)

The reference materializes the full [B, T] weight matrix through gorgonia ops
at T=10; this kernel tiles T so the same program scales to thousands of
behaviors (SURVEY.md §5 long-context note) without ever materializing
[B, T, D] intermediates in HBM — behaviors stream HBM→VMEM tile by tile and
the accumulator lives in VMEM scratch.

At tiny T the XLA-fused jnp path is already optimal; `din_attention_pool`
auto-routes (pallas for T ≥ threshold, jnp otherwise).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from goctr_tpu.ops.activations import cosine_similarity

# VMEM note: the trailing model dim D pads to the 128-lane tile, inflating a
# [BB, BT, D] block (and every elementwise temporary) by 128/D when D < 128;
# blocks are sized so the padded double-buffered footprint + temporaries stay
# under the ~16MB scoped-VMEM budget even at D=16. BLOCK_B balances sublane
# occupancy per program (tiny blocks starve the VPU) against scoped VMEM:
# measured on a v5e at D=64: (64, 256) OOM'd by 192KB, (32, 256) by 5.09MB
# (21.09M scoped stack incl. elementwise temporaries), (16, 128) compiles
# with ~5.3MB of headroom to spare.
BLOCK_B = 16
BLOCK_T = 128


def _kernel(beh_ref, item_ref, att0_ref, mask_ref, out_ref, acc_ref,
            cnt_ref, *, n_t_tiles: int, t_total: int, ragged_tail: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    beh = beh_ref[:]                    # [BB, BT, D]
    item = item_ref[:]                  # [BB, D]
    att0 = att0_ref[:]                  # [1, BT]
    mask = mask_ref[:]                  # [BB, BT]

    if ragged_tail:
        # when T % BT != 0 the final tile reads past the array; those lanes
        # are undefined (NaN in interpret mode) and NaN*0 != 0 — zero them.
        # Static-gated: aligned shapes skip these block-sized temporaries
        # (they alone overflow scoped VMEM at BLOCK_B=32, measured on v5e).
        bt = mask.shape[1]
        t_idx = t * bt + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        in_range = (t_idx < t_total).astype(beh.dtype)
        mask = jnp.where(in_range > 0, mask, 0.0)
        beh = jnp.where(in_range[..., None] > 0, beh, 0.0)
        att0 = jnp.where(in_range > 0, att0, 0.0)

    # batched einsums don't lower in Mosaic; express as mul+reduce (VPU)
    dot = jnp.sum(beh * item[:, None, :], axis=-1)       # [BB, BT]
    bn = jnp.sqrt(jnp.sum(beh * beh, axis=-1))
    inorm = jnp.sqrt(jnp.sum(item * item, axis=-1))
    cos = dot / (bn * inorm[:, None] + 1e-8)
    weight = (cos + 1.0) * 0.5
    gate = jax.nn.sigmoid(weight * att0) * mask   # [BB, BT]

    acc_ref[:] += jnp.sum(beh * gate[..., None], axis=1)
    cnt_ref[:] += jnp.sum(mask, axis=-1, keepdims=True)

    @pl.when(t == n_t_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:] / jnp.maximum(cnt_ref[:], 1.0)


def din_attention_pool_pallas(behaviors: jax.Array, item: jax.Array,
                              att0: jax.Array,
                              mask: jax.Array | None = None,
                              interpret: bool = False) -> jax.Array:
    """behaviors [B,T,D], item [B,D], att0 [T], mask [B,T] → [B,D]."""
    b, t, d = behaviors.shape
    # CPU (tests/virtual meshes) only supports interpreter-mode pallas
    interpret = interpret or jax.default_backend() == "cpu"
    if mask is None:
        mask = jnp.ones((b, t), behaviors.dtype)
    bb = min(BLOCK_B, b)
    bt = min(BLOCK_T, t)
    grid = (pl.cdiv(b, bb), pl.cdiv(t, bt))

    return pl.pallas_call(
        functools.partial(_kernel, n_t_tiles=grid[1], t_total=t,
                          ragged_tail=(t % bt != 0)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, bt, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bt), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), behaviors.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, d), jnp.float32),
            pltpu.VMEM((bb, 1), jnp.float32),
        ],
        interpret=interpret,
    )(behaviors, item, att0.reshape(1, t), mask)


def din_attention_pool_jnp(behaviors, item, att0, mask=None):
    """XLA-fused reference path (identical math)."""
    if mask is None:
        mask = jnp.ones(behaviors.shape[:2], behaviors.dtype)
    weight = (cosine_similarity(behaviors, item[:, None, :]) + 1.0) * 0.5
    gate = jax.nn.sigmoid(weight * att0) * mask
    pooled = jnp.einsum("bt,btd->bd", gate, behaviors)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return pooled / denom


def din_attention_pool(behaviors, item, att0, mask=None, *,
                       min_seq_for_pallas: int = 256,
                       interpret: bool = False):
    """Auto-routed DIN attention pool: Pallas for long sequences (streamed
    tiles, no [B,T,D] HBM intermediates), fused jnp below the threshold."""
    t = behaviors.shape[1]
    if t >= min_seq_for_pallas or interpret:
        return din_attention_pool_pallas(behaviors, item, att0, mask,
                                         interpret=interpret)
    return din_attention_pool_jnp(behaviors, item, att0, mask)
