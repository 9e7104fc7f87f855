"""Plain MLP ranker over the whole flat feature row.

The counterpart of the reference's SimpleMlp wrapper path
(model/mlp/mlp.go:45-65 → sklearn-port MLPClassifier with hidden [100],
relu — main.go:42-47): ignores the 4-block structure and consumes the full
row. Logits out; glorot + bias by default.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from goctr_tpu.models.base import dropout as _dropout, init_linear
from goctr_tpu.ops.activations import ACTIVATIONS


@dataclasses.dataclass
class MLPTower:
    in_dim: int
    hidden: tuple[int, ...] = (100,)
    activation: str = "relu"
    dropout_rate: float = 0.0
    use_bias: bool = True
    parity_init: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    behavior_len: int = 0   # unused; keeps the RankModel contract uniform

    def init_params(self, key: jax.Array) -> dict:
        init = "reference" if self.parity_init else "glorot"
        dims = (self.in_dim,) + tuple(self.hidden) + (1,)
        keys = jax.random.split(key, len(dims) - 1)
        params = {
            "mlp": [init_linear(k, (dims[i], dims[i + 1]), init)
                    for i, k in enumerate(keys)],
        }
        if self.use_bias:
            params["bias"] = [jnp.zeros((d,), jnp.float32) for d in dims[1:]]
        return params

    def apply(self, params: dict, blocks: tuple, *, train: bool = False,
              key: Optional[jax.Array] = None) -> jax.Array:
        # MLPTower consumes the full row: callers pass blocks=(x,) or the
        # 4-block tuple, which is re-concatenated (a no-op copy under XLA).
        if len(blocks) == 1:
            h = blocks[0]
        else:
            profile, behaviors, item, ctx = blocks
            h = jnp.concatenate(
                [profile, behaviors.reshape(behaviors.shape[0], -1), item, ctx],
                axis=1)
        cd = self.compute_dtype
        h = h.astype(cd)
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
                h = _dropout(h, self.dropout_rate,
                             dkeys[i] if key is not None else None, train)
                h = h.astype(cd)
        return h[:, 0].astype(jnp.float32)
