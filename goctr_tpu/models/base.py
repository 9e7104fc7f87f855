"""Shared model contract: the 4-block sample layout and the RankModel protocol.

The reference feeds every ranker the same flat float32 row, partitioned by
`SampleInfo` column ranges into user-profile / user-behavior / item / context
blocks (recommend/rcmd.go:132-137, sliced per batch in model/model.go:128-187).
The TPU-native contract keeps that layout — one contiguous [N, W] device array,
sliced lazily inside the jitted step (a free view under XLA, unlike the
reference's per-batch tensor.Slice copies).

Models are pure: `init_params(key) → pytree`, `apply(params, blocks, train,
key) → logits [B]`. Probabilities are sigmoid(logits); keeping logits until
the loss gives stable BCE and one fewer transcendental in the hot loop.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SampleInfo:
    """Column ranges [start, end) into the flat feature row."""
    user_profile_range: tuple[int, int]
    user_behavior_range: tuple[int, int]
    item_feature_range: tuple[int, int]
    ctx_feature_range: tuple[int, int]

    @property
    def width(self) -> int:
        return max(r[1] for r in (self.user_profile_range,
                                  self.user_behavior_range,
                                  self.item_feature_range,
                                  self.ctx_feature_range))

    def dims(self, behavior_len: int) -> tuple[int, int, int, int, int]:
        """(u_profile_dim, behavior_len, behavior_dim, item_dim, ctx_dim)."""
        up = self.user_profile_range[1] - self.user_profile_range[0]
        ub = self.user_behavior_range[1] - self.user_behavior_range[0]
        it = self.item_feature_range[1] - self.item_feature_range[0]
        cx = self.ctx_feature_range[1] - self.ctx_feature_range[0]
        if behavior_len > 0 and ub % behavior_len != 0:
            raise ValueError(f"behavior block {ub} not divisible by T={behavior_len}")
        bd = ub // behavior_len if behavior_len else 0
        return up, behavior_len, bd, it, cx


@dataclasses.dataclass
class TrainSample:
    """Assembled training set (reference TrainSample rcmd.go:60-67)."""
    x: np.ndarray          # [N, W] float32
    y: np.ndarray          # [N] float32 in {0,1}
    info: SampleInfo

    @property
    def rows(self) -> int:
        return self.x.shape[0]

    @property
    def x_cols(self) -> int:
        return self.x.shape[1]


def split_blocks(x: jax.Array, info: SampleInfo, behavior_len: int):
    """Flat [B, W] row → (user_profile, behaviors [B,T,D], item, ctx)."""
    up = x[:, info.user_profile_range[0]:info.user_profile_range[1]]
    ubm = x[:, info.user_behavior_range[0]:info.user_behavior_range[1]]
    it = x[:, info.item_feature_range[0]:info.item_feature_range[1]]
    cx = x[:, info.ctx_feature_range[0]:info.ctx_feature_range[1]]
    if behavior_len:
        ub = ubm.reshape(ubm.shape[0], behavior_len, -1)
    else:
        ub = ubm.reshape(ubm.shape[0], 0, 0)
    return up, ub, it, cx


@runtime_checkable
class RankModel(Protocol):
    behavior_len: int

    def init_params(self, key: jax.Array) -> dict: ...

    def apply(self, params: dict, blocks: tuple, *, train: bool = False,
              key: Optional[jax.Array] = None) -> jax.Array: ...


# ------------------------------------------------------------ shared pieces --

def glorot(key: jax.Array, shape: tuple[int, int],
           dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[1]
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key: jax.Array, shape: tuple[int, int], init: str) -> jax.Array:
    if init == "reference":
        # Gaussian(0,1), the reference's init (din.go:188-194); kept for
        # ablation parity only — glorot converges far better.
        return jax.random.normal(key, shape, jnp.float32)
    return glorot(key, shape)


def dropout(x: jax.Array, rate: float, key: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
