"""SparseCTR — the scale-out flagship: sharded embedding tables + DIN tower.

This is the model the reference *couldn't* build (its item embeddings are a
pre-trained in-memory Go map, rcmd.go:501-531, capped by one host's RAM):
end-to-end-trainable id embeddings living row-sharded across the `model` mesh
axis, attention-pooled DIN-style against the candidate item, with dense
profile/ctx features — DLRM-shaped, BASELINE config #5.

Inputs are raw ids + dense blocks (SparseBatch), not pre-assembled float rows:
the embedding gather happens on device, inside the jitted step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from goctr_tpu.models.base import dropout as _dropout, init_linear
from goctr_tpu.ops.activations import ACTIVATIONS, cosine_similarity
from goctr_tpu.parallel.embedding import (
    EmbeddingSpec, init_table, sharded_lookup, sharded_pooled_lookup,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseBatch:
    """One device batch of raw features (a pytree: jit/shard-friendly)."""
    user_profile: jax.Array    # [B, U] float32 dense
    behavior_ids: jax.Array    # [B, T] int32, -1 padded
    item_ids: jax.Array        # [B] int32
    ctx: jax.Array             # [B, C] float32 dense
    labels: jax.Array          # [B] float32


@dataclasses.dataclass
class SparseCTR:
    item_vocab: int
    emb_dim: int = 16          # reference ItemEmbDim rcmd.go:22
    u_profile_dim: int = 8
    ctx_dim: int = 4
    behavior_len: int = 10     # reference UserBehaviorLen rcmd.go:24
    hidden: tuple[int, ...] = (200, 80)
    activation: str = "relu"
    dropout_rate: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    # >0 enables the deduplicated unique-row lookup exchange on sharded
    # meshes (see parallel/embedding.py sharded_lookup): cap on per-data-
    # shard unique ids; choose from measured batch uniqueness
    lookup_dedup_cap: int = 0
    # behavior-sequence pooling: "din_attention" (cosine-gated, din.go
    # semantics) or "mean" — the YouTube-DNN watch-history average
    # (dnn.go:182-203) at embedding scale. Mean pooling on sharded meshes
    # routes through sharded_pooled_lookup: pooling happens INSIDE the
    # lookup exchange, so the psum moves [B/d, D] instead of [B/d, T, D] —
    # a T× ICI traffic cut DIN's data-dependent gate cannot use.
    pooling: str = "din_attention"

    def __post_init__(self):
        if self.pooling not in ("din_attention", "mean"):
            raise ValueError(f"unknown pooling {self.pooling!r}")

    @property
    def spec(self) -> EmbeddingSpec:
        return EmbeddingSpec("item", self.item_vocab, self.emb_dim)

    @property
    def concat_dim(self) -> int:
        # profile + attention-pooled behaviors + item emb + ctx
        return self.u_profile_dim + 2 * self.emb_dim + self.ctx_dim

    def init_params(self, key: jax.Array, mesh: Mesh,
                    table_group: int = 1) -> dict:
        """table_group > 1 initializes the item table directly as grouped
        128-lane lines ([V_pad/G, 128], pack_table_grouped layout, V_pad a
        multiple of m·G) — the [V, D] intermediate never materializes (it
        lane-pads D→128 under tiling: 51 GB at 100M × 16)."""
        k_table, k_mlp = jax.random.split(key)
        dims = (self.concat_dim,) + tuple(self.hidden) + (1,)
        keys = jax.random.split(k_mlp, len(dims) - 1)
        if table_group > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from goctr_tpu.core.meshes import MODEL_AXIS
            from goctr_tpu.ops.pallas.row_optimizer import (
                init_packed_table_grouped)
            m = mesh.shape[MODEL_AXIS]
            v_pad = -(-self.item_vocab // (m * table_group)) * (
                m * table_group)
            table = jax.jit(
                lambda k: init_packed_table_grouped(
                    k, self.item_vocab, self.emb_dim,
                    lines=v_pad // table_group),
                out_shardings=NamedSharding(mesh, P(MODEL_AXIS, None)),
            )(k_table)
        else:
            table = init_table(k_table, self.spec, mesh)
        return {
            "item_table": table,
            "att0": jnp.ones((self.behavior_len,), jnp.float32),
            "mlp": [init_linear(k, (dims[i], dims[i + 1]), "glorot")
                    for i, k in enumerate(keys)],
            "bias": [jnp.zeros((d,), jnp.float32) for d in dims[1:]],
        }

    def apply_pooled(self, params: dict, profile: jax.Array,
                     behaviors: jax.Array, item: jax.Array, ctx: jax.Array,
                     mask: jax.Array, *, train: bool = False,
                     key: Optional[jax.Array] = None) -> jax.Array:
        """Dense tower over pre-gathered embeddings: behaviors [B, T, D],
        item [B, D], mask [B, T] (1 for real behaviors, 0 for −1 pads).
        Split out of apply() so trainers that manage the embedding table
        themselves (parallel/scanned.py: scatter-add sparse updates, no
        dense [V, D] gradient) can differentiate w.r.t. the gathered rows."""
        cd = self.compute_dtype
        behaviors = behaviors.astype(cd)
        item = item.astype(cd)

        denom = jnp.maximum(jnp.sum(mask.astype(cd), axis=1, keepdims=True),
                            1.0)
        if self.pooling == "mean":
            # YouTube-DNN watch-history average (dnn.go:182-203)
            pooled = jnp.sum(behaviors * mask.astype(cd)[..., None],
                             axis=1) / denom
        else:
            # DIN-style gated attention pool (din.go:231-298 semantics)
            weight = (cosine_similarity(behaviors, item[:, None, :])
                      + 1.0) * 0.5
            gate = jax.nn.sigmoid(weight * params["att0"].astype(cd))
            gated = behaviors * (gate * mask.astype(cd))[..., None]
            pooled = jnp.sum(gated, axis=1) / denom
        return self._tower(params, profile, pooled, item, ctx,
                           train=train, key=key)

    def _tower(self, params: dict, profile, pooled, item, ctx, *,
               train: bool = False,
               key: Optional[jax.Array] = None) -> jax.Array:
        """Dense MLP over [profile | pooled behaviors | item | ctx]."""
        cd = self.compute_dtype
        h = jnp.concatenate([profile.astype(cd), pooled.astype(cd),
                             item.astype(cd), ctx.astype(cd)], axis=1)
        act = ACTIVATIONS[self.activation]
        n_layers = len(params["mlp"])
        if key is not None:
            dkeys = jax.random.split(key, n_layers)
        for i, w in enumerate(params["mlp"]):
            h = jnp.dot(h, w.astype(cd), preferred_element_type=jnp.float32)
            h = h + params["bias"][i]
            if i < n_layers - 1:
                h = act(h)
                h = _dropout(h, self.dropout_rate,
                             dkeys[i] if key is not None else None, train)
                h = h.astype(cd)
        return h[:, 0].astype(jnp.float32)   # logits

    def apply(self, params: dict, batch: SparseBatch, mesh: Mesh, *,
              train: bool = False, key: Optional[jax.Array] = None,
              table_group: int = 1, table_packed: bool = False) -> jax.Array:
        """table_group > 1: params["item_table"] is grouped 128-lane lines
        (pack_table_grouped layout) — lookups pass group/width through.
        table_packed: one-row-per-line [V, 128] (w | acc | pad) layout —
        lookups lane-slice the first emb_dim lanes (mid-training predict
        over the fused G=1 layout)."""
        g = table_group
        w = self.emb_dim if (g > 1 or table_packed) else 0
        item = sharded_lookup(params["item_table"], batch.item_ids, mesh,
                              dedup_cap=self.lookup_dedup_cap, width=w,
                              group=g)
        if self.pooling == "mean" and g == 1 and not table_packed:
            # fused gather+pool: the [B, T, D] behavior block never leaves
            # the lookup exchange (T× ICI cut on sharded meshes; the Pallas
            # fused gather+pool kernel on a single device where shapes fit)
            pooled = sharded_pooled_lookup(
                params["item_table"], batch.behavior_ids, mesh,
                combiner="mean")
            return self._tower(params, batch.user_profile, pooled, item,
                               batch.ctx, train=train, key=key)
        # DIN attention needs the per-position rows: full sharded gather
        # (grouped tables take this path for mean pooling too — the pooled
        # fast path has no grouped-line variant)
        behaviors = sharded_lookup(params["item_table"], batch.behavior_ids,
                                   mesh, dedup_cap=self.lookup_dedup_cap,
                                   width=w, group=g)
        mask = (batch.behavior_ids >= 0).astype(jnp.float32)
        return self.apply_pooled(params, batch.user_profile, behaviors, item,
                                 batch.ctx, mask, train=train, key=key)
