"""DIN — attention-over-behavior-sequence ranker, TPU-native.

Behavioral parity with reference model/din/din.go:219-323:
  weight = (cosine_sim(behaviors, item) + 1) / 2          # din.go:231-237
  gate   = sigmoid(weight * att0)                         # din.go:264-276
  pooled = mean(behaviors * gate, axis=seq)               # din.go:298
  out    = MLP(concat(profile, pooled, item, ctx))        # din.go:301-315
with hidden sizes 200→80→1, sigmoid activations, dropout 0.005.

TPU-first differences: logits output (sigmoid fused into the loss), optional
biases + glorot init (reference has neither — `parity_init` restores its
Gaussian(0,1)/no-bias setup), and the whole forward is one fused XLA graph:
at the reference's tiny T=10, D=16 an attention matmul is bandwidth-trivial,
so the win is fusing gate+pool+concat into the first MLP matmul rather than
hand-writing a kernel. For long sequences goctr_tpu.ops.pallas.din_attention
provides the blockwise kernel (SURVEY.md §5 long-context note).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from goctr_tpu.models.base import dropout as _dropout, init_linear
from goctr_tpu.ops.activations import ACTIVATIONS, cosine_similarity


@dataclasses.dataclass
class DIN:
    u_profile_dim: int
    behavior_len: int          # uBehaviorSize, reference UserBehaviorLen=10
    behavior_dim: int          # uBehaviorDim == iFeatureDim (din.go:177)
    i_feature_dim: int
    c_feature_dim: int
    hidden: tuple[int, ...] = (200, 80)
    activation: str = "sigmoid"
    dropout_rates: tuple[float, float] = (0.005, 0.005)
    use_bias: bool = True
    parity_init: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # "xla" (default) or "pallas". Measured on a v5e at B=1024, T=512,
    # D=64 with amortized varied-input scans (BENCH_NOTES 2026-08-20): the
    # fused-XLA path runs 1.25 ms/call (107 GB/s on the behavior stream) vs
    # the blockwise Pallas kernel's 2.63 ms — XLA's fusion already keeps the
    # [B,T,D] stream HBM-bound, so the kernel stays opt-in for ablation and
    # as the template for shapes XLA mishandles.
    attention_impl: str = "xla"

    def __post_init__(self):
        if self.behavior_dim != self.i_feature_dim:
            raise ValueError(
                f"behavior_dim {self.behavior_dim} != i_feature_dim "
                f"{self.i_feature_dim} (required by DIN attention)")
        if self.attention_impl not in ("xla", "pallas"):
            raise ValueError(
                f"attention_impl must be 'xla' or 'pallas', got "
                f"{self.attention_impl!r}")

    @property
    def concat_dim(self) -> int:
        return (self.u_profile_dim + self.behavior_dim + self.i_feature_dim
                + self.c_feature_dim)

    def init_params(self, key: jax.Array) -> dict:
        init = "reference" if self.parity_init else "glorot"
        dims = (self.concat_dim,) + tuple(self.hidden) + (1,)
        keys = jax.random.split(key, len(dims) - 1)
        params = {
            "att0": jnp.ones((self.behavior_len,), jnp.float32),  # din.go:185
            "mlp": [init_linear(k, (dims[i], dims[i + 1]), init)
                    for i, k in enumerate(keys)],
        }
        if self.use_bias and not self.parity_init:
            params["bias"] = [jnp.zeros((d,), jnp.float32) for d in dims[1:]]
        return params

    def apply(self, params: dict, blocks: tuple, *, train: bool = False,
              key: Optional[jax.Array] = None) -> jax.Array:
        profile, behaviors, item, ctx = blocks
        cd = self.compute_dtype
        behaviors = behaviors.astype(cd)              # [B, T, D]

        if self.attention_impl == "pallas":
            # explicit opt-in forces the kernel at every T (the auto-router
            # din_attention_pool would silently fall back to jnp below its
            # min_seq_for_pallas threshold — ADVICE r2)
            from goctr_tpu.ops.pallas.din_attention import (
                din_attention_pool_pallas)
            pooled = din_attention_pool_pallas(
                behaviors, item.astype(cd), params["att0"].astype(cd))
        else:
            item3 = item.astype(cd)[:, None, :]       # [B, 1, D]
            weight = (cosine_similarity(behaviors, item3) + 1.0) * 0.5
            gate = jax.nn.sigmoid(weight * params["att0"].astype(cd))
            pooled = jnp.mean(behaviors * gate[..., None], axis=1)

        h = jnp.concatenate(
            [profile.astype(cd), pooled, item.astype(cd), ctx.astype(cd)],
            axis=1)

        act = ACTIVATIONS[self.activation]
        biases = params.get("bias")
        n_layers = len(params["mlp"])
        if key is not None:
            dkeys = jax.random.split(key, n_layers)
        for i, w in enumerate(params["mlp"]):
            h = jnp.dot(h, w.astype(cd), preferred_element_type=jnp.float32)
            if biases is not None:
                h = h + biases[i]
            if i < n_layers - 1:
                h = act(h)
                rate = self.dropout_rates[min(i, len(self.dropout_rates) - 1)]
                h = _dropout(h, rate, dkeys[i] if key is not None else None,
                             train)
            h = h.astype(cd) if i < n_layers - 1 else h
        return h[:, 0].astype(jnp.float32)   # logits
