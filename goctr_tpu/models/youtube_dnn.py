"""YouTube-DNN ranker: average-pooled behavior history + MLP.

Parity with reference model/youtube/dnn.go:162-184: mean-pool the behavior
embeddings over the sequence axis, concat with profile/item/ctx, 200→80→1
sigmoid MLP with dropout 0.003. Same TPU-first conventions as DIN (logits
out, optional bias/glorot, bf16-ready).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from goctr_tpu.models.base import dropout as _dropout, init_linear
from goctr_tpu.ops.activations import ACTIVATIONS


@dataclasses.dataclass
class YoutubeDNN:
    u_profile_dim: int
    behavior_len: int
    behavior_dim: int
    i_feature_dim: int
    c_feature_dim: int
    hidden: tuple[int, ...] = (200, 80)
    activation: str = "sigmoid"
    dropout_rates: tuple[float, float] = (0.003, 0.003)
    use_bias: bool = True
    parity_init: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def concat_dim(self) -> int:
        return (self.u_profile_dim + self.behavior_dim + self.i_feature_dim
                + self.c_feature_dim)

    def init_params(self, key: jax.Array) -> dict:
        init = "reference" if self.parity_init else "glorot"
        dims = (self.concat_dim,) + tuple(self.hidden) + (1,)
        keys = jax.random.split(key, len(dims) - 1)
        params = {
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
        pooled = jnp.mean(behaviors.astype(cd), axis=1)   # dnn.go:167
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
                h = h.astype(cd)
        return h[:, 0].astype(jnp.float32)   # logits
