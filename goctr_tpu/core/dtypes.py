"""Dtype policy: f32 parameters, bf16 compute on the MXU.

The reference computes everything in float32/float64 on CPU (gorgonia model.DT,
/root/reference/model/model.go). On TPU the MXU natively multiplies bf16 at 2x
the f32 rate, so the policy here is: keep parameters and optimizer state in
float32, cast activations entering matmuls to bfloat16, accumulate in float32
(`preferred_element_type=float32`).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)


def default_policy(use_bf16: bool = True) -> DTypePolicy:
    if use_bf16:
        return DTypePolicy()
    return DTypePolicy(compute_dtype=jnp.float32)


# Full-f32 policy for numerical parity tests against CPU oracles.
F32 = DTypePolicy(compute_dtype=jnp.float32)
