"""Row-sharded embedding tables over the `model` mesh axis.

The reference has no parallelism at all (SURVEY.md P4/P5: its embedding "table"
is a Go map on one host, rcmd.go:501-531). The TPU-native design is
DLRM/Megatron-style: tables live row-sharded across the `model` axis so a
100M-row table (BASELINE config #5) fits a pod slice; dense towers are pure DP
over `data`.

Lookup exchange: every `model` shard holds rows [V/m, D]. Inside shard_map the
ids (batch-sharded over `data`, replicated over `model`) index the local shard
masked to its row range, then a `psum` over `model` combines the one non-zero
contribution per id. The psum moves exactly one [B/d, D] buffer per device
over ICI — the same volume as an all-to-all of gathered rows, with none of the
index bookkeeping. Gradients flow through the same path in reverse (psum
transposes to identity; the masked gather transposes to a local scatter-add),
so each shard's rows get exactly its own gradient rows — a Hogwild-free
equivalent of the reference's lock-free updates (word2vec.go:168).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from goctr_tpu.core.meshes import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass(frozen=True)
class EmbeddingSpec:
    name: str
    vocab: int
    dim: int

    def padded_vocab(self, n_shards: int) -> int:
        return -(-self.vocab // n_shards) * n_shards


def init_table(key: jax.Array, spec: EmbeddingSpec, mesh: Mesh,
               scale: float = 0.01) -> jax.Array:
    """[padded_vocab, dim] float32, rows sharded over the model axis."""
    n_shards = mesh.shape[MODEL_AXIS]
    v = spec.padded_vocab(n_shards)
    sharding = NamedSharding(mesh, P(MODEL_AXIS, None))
    return jax.device_put(
        jax.random.normal(key, (v, spec.dim), jnp.float32) * scale, sharding)


def _extract_group(lines: jax.Array, slot: jax.Array, group: int,
                   width: int) -> jax.Array:
    """lines [..., 128] grouped-line rows (pack_table_grouped layout),
    slot [...] = row index within its line → [..., width] embeddings.
    One-hot einsum over the [..., G, width+1] view (same construction as
    the scanned trainer's grouped predict, parallel/scanned.py)."""
    stride = width + 1
    l3 = lines[..., :group * stride].reshape(lines.shape[:-1]
                                             + (group, stride))
    oh = jax.nn.one_hot(slot, group, dtype=lines.dtype)
    return jnp.einsum("...g,...gd->...d", oh, l3)[..., :width]


def _local_gather(local_rows: jax.Array, ids: jax.Array,
                  n_shards: int, width: int = 0,
                  group: int = 1) -> jax.Array:
    """Gather ids from this shard's row range, zeros elsewhere; combine with
    psum over the model axis. Runs inside shard_map. width > 0 lane-slices
    packed rows BEFORE the psum (so a [V/m, 128] packed table moves only
    [.., width] over ICI). group > 1: local_rows are grouped 128-lane
    LINES of `group` (w | acc) row-slots each; ids stay ROW ids."""
    if group > 1:
        per_lines = local_rows.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        local_ids = ids - shard * (per_lines * group)
        valid = (local_ids >= 0) & (local_ids < per_lines * group)
        safe = jnp.clip(local_ids, 0, per_lines * group - 1)
        lines = jnp.take(local_rows, safe // group, axis=0)
        emb = _extract_group(lines, safe % group, group, width)
        emb = jnp.where(valid[..., None], emb, 0.0)
        return jax.lax.psum(emb, MODEL_AXIS)
    per_shard = local_rows.shape[0]
    shard = jax.lax.axis_index(MODEL_AXIS)
    local_ids = ids - shard * per_shard
    valid = (local_ids >= 0) & (local_ids < per_shard)
    safe = jnp.clip(local_ids, 0, per_shard - 1)
    emb = jnp.take(local_rows, safe, axis=0)
    if width:
        emb = emb[..., :width]
    emb = jnp.where(valid[..., None], emb, 0.0)
    return jax.lax.psum(emb, MODEL_AXIS)


def _single_device(mesh: Mesh) -> bool:
    return mesh.shape[MODEL_AXIS] == 1 and mesh.shape[DATA_AXIS] == 1


def _dedup_flat(flat: jax.Array, cap: int):
    """Static-shape batch dedup: sort, mark run starts, compact the unique
    values into a [cap] buffer, and return per-position slot indices.

    Returns (uniq [cap] — unique ids, -1 padded; inv [n] — slot of each
    original position; n_unique [] — actual unique count). If n_unique >
    cap, ids beyond the cap are DROPPED from `uniq` (their `inv` slots
    clip) — callers choose `cap` from measured batch uniqueness and may
    assert `n_unique <= cap` outside jit (see sharded_lookup docstring).
    """
    n = flat.shape[0]
    order = jnp.argsort(flat)
    s = jnp.take(flat, order)
    new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    slot_sorted = jnp.cumsum(new) - 1                  # [n], 0-based slots
    uniq = jnp.full((cap,), -1, flat.dtype).at[slot_sorted].set(
        s, mode="drop")
    inv = jnp.zeros((n,), slot_sorted.dtype).at[order].set(slot_sorted)
    return uniq, inv, slot_sorted[-1] + 1


def sharded_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh,
                   dedup_cap: int = 0, with_overflow: bool = False,
                   width: int = 0, group: int = 1):
    """ids [B, ...] int32 → embeddings [B, ..., D], batch-sharded over data.

    width > 0: the table rows are PACKED (e.g. [V, 128] w|acc|pad from the
    fused row-optimizer layout) and only the first `width` lanes are the
    embedding — they are sliced out before any psum so ICI traffic is
    [., width], not [., 128].

    group > 1: the table is GROUPED LINES ([L, 128], pack_table_grouped
    layout: `group` (w | acc) slots per 128-lane line — BASELINE #5's
    storage layout, 7.3 GB instead of 51 at 100M × 16). `width` must be
    the embedding dim; ids remain ROW ids (row r lives in line r // group,
    slot r % group). Each model shard owns L/m lines = (L/m)·group rows.

    Negative ids (padding) return zero vectors. On a 1×1 mesh this is a
    plain gather — no shard_map (which some single-chip PJRT backends,
    including this environment's axon relay, cannot compile).

    dedup_cap > 0 enables deduplicated exchange (SURVEY.md §7 hard part
    (b)): each data shard sorts its local id batch, gathers + psums only
    the ≤cap unique rows ([cap, D] over ICI instead of [n_local_ids, D] —
    an n/cap traffic cut for CTR batches, where hot items repeat heavily),
    then expands locally with a comm-free take. `cap` bounds per-shard
    batch uniqueness and is a STATIC shape: choose it from measured data
    (e.g. np.unique on a sample of host batches). Exact whenever per-shard
    uniques ≤ cap — asserted in tests/test_parallel.py on the virtual mesh.

    with_overflow=True returns (out, overflow) where overflow is the total
    (summed over data shards) count of unique ids DROPPED because they
    exceeded the cap — monitor it in the train loop and grow the cap if it
    is ever nonzero, because an over-cap batch silently clips those rows to
    wrong embeddings (VERDICT r2 weak #4). Zero whenever the dedup path is
    off (dedup_cap == 0 or single-device mesh: those paths are exact).
    """
    if group > 1 and not width:
        raise ValueError("grouped lookup requires width=emb_dim")
    if _single_device(mesh):
        safe = jnp.maximum(ids, 0)
        if group > 1:
            lines = jnp.take(table, safe // group, axis=0)
            emb = _extract_group(lines, safe % group, group, width)
        else:
            emb = jnp.take(table, safe, axis=0)
            if width:
                emb = emb[..., :width]
        out = jnp.where(ids[..., None] < 0, 0.0, emb)
        return (out, jnp.int32(0)) if with_overflow else out

    n_shards = mesh.shape[MODEL_AXIS]
    out_dim = width or table.shape[1]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
             out_specs=(P(DATA_AXIS), P()),
             check_vma=False)
    def run(local_rows, local_ids):
        if not dedup_cap:
            neg = local_ids < 0
            out = _local_gather(local_rows, jnp.maximum(local_ids, 0),
                                n_shards, width, group)
            return (jnp.where(neg[..., None], 0.0, out),
                    jnp.zeros((), jnp.int32))

        flat = local_ids.reshape(-1)
        cap = min(dedup_cap, flat.shape[0])
        uniq, inv, n_unique = _dedup_flat(flat, cap)
        emb_u = _local_gather(local_rows, jnp.maximum(uniq, 0), n_shards,
                              width, group)
        emb_u = jnp.where(uniq[:, None] < 0, 0.0, emb_u)   # [cap, out_dim]
        out = jnp.take(emb_u, jnp.clip(inv, 0, cap - 1), axis=0)
        # ids are replicated over model, so n_unique already agrees across
        # model shards; summing over data gives the global dropped count
        over = jax.lax.psum(
            jnp.maximum(n_unique - cap, 0).astype(jnp.int32), DATA_AXIS)
        return out.reshape(local_ids.shape + (out_dim,)), over

    out, over = run(table, ids)
    return (out, over) if with_overflow else out


def sharded_pooled_lookup(table: jax.Array, ids: jax.Array, mesh: Mesh,
                          combiner: str = "mean") -> jax.Array:
    """Fused gather+pool: ids [B, K] (−1 padded) → pooled [B, D].

    Pooling before leaving shard_map means the psum moves [B/d, D] instead of
    [B/d, K, D] — a K× ICI traffic cut; this is the multi-hot fast path
    (reference StringSplitMultiHot semantics at embedding scale).
    """
    if _single_device(mesh):
        if combiner == "mean":
            # fused Pallas gather+pool on TPU: [B, K, D] never hits HBM
            from goctr_tpu.ops.pallas.embedding_lookup import gather_pool_mean
            return gather_pool_mean(table, ids)
        valid = (ids >= 0).astype(table.dtype)
        emb = jnp.take(table, jnp.maximum(ids, 0), axis=0)
        return jnp.sum(emb * valid[..., None], axis=1)

    n_shards = mesh.shape[MODEL_AXIS]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
             out_specs=P(DATA_AXIS, None),
             check_vma=False)
    def run(local_rows, local_ids):
        per_shard = local_rows.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        rel = local_ids - shard * per_shard
        valid = (local_ids >= 0) & (rel >= 0) & (rel < per_shard)
        safe = jnp.clip(rel, 0, per_shard - 1)
        emb = jnp.take(local_rows, safe, axis=0)          # [b, K, D]
        emb = jnp.where(valid[..., None], emb, 0.0)
        pooled = jnp.sum(emb, axis=1)                     # local partial sum
        pooled = jax.lax.psum(pooled, MODEL_AXIS)
        if combiner == "mean":
            count = jnp.sum((local_ids >= 0).astype(jnp.float32), axis=1,
                            keepdims=True)
            pooled = pooled / jnp.maximum(count, 1.0)
        return pooled

    return run(table, ids)
