"""Device-mesh construction for single-chip through multi-host runs.

The reference has no distributed backend at all (SURVEY.md P4/P5: goroutine
channels are its only "collectives"). The TPU-native design instead routes all
parallelism through one abstraction: a `jax.sharding.Mesh` with a `data` axis
(batch / DP) and a `model` axis (row-sharded embedding tables, Megatron/DLRM
style). Dense-tower gradients psum over `data`; embedding lookups all-to-all
over `model`; both ride ICI.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def data_axis() -> str:
    return DATA_AXIS


def model_axis() -> str:
    return MODEL_AXIS


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """How to slice the device set into (data, model) axes."""

    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        if n_devices % model != 0:
            raise ValueError(f"{n_devices} devices not divisible by model={model}")
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def make_mesh(spec: MeshSpec | None = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2D (data, model) mesh over all (or the given) devices.

    Device order follows jax.devices(), which on TPU slices enumerates in
    physical-torus order so adjacent mesh coordinates are ICI neighbors.
    """
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    d, m = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (vocab-row) dim over the model axis (embedding tables)."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up: call once per process before building meshes.

    Controlled by standard env vars; a no-op for single-host runs so local
    scripts/tests never need to care.
    """
    if os.environ.get("GOCTR_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["GOCTR_COORDINATOR"],
            num_processes=int(os.environ.get("GOCTR_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("GOCTR_PROCESS_ID", "0")),
        )
