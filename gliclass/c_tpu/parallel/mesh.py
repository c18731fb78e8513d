"""Device mesh construction for the serving/training engine.

The reference has no distributed parallelism of any kind (SURVEY §2: OpenMP
threads + one optional mutex-serialized GPU, reference main.c:141-150). Here the
parallelism model is a 2-D ``jax.sharding.Mesh``:

    ("data", "model"): data-parallel replicas x tensor-parallel shards

Tensor-parallel collectives ride ICI within a slice; data parallelism is
embarrassingly parallel over requests. Encoder-only serving needs no pipeline or
expert axes (SURVEY §2: "PP/EP are not applicable to these small encoder
checkpoints") — scaling beyond TP is by adding data-parallel replicas.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh from ``dp * tp`` devices.

    With ``devices=None``, uses the first dp*tp of ``jax.devices()``. TP groups
    are laid out over adjacent devices so their collectives stay on the
    fastest links (adjacent devices share ICI on a slice).
    """
    if devices is None:
        devices = jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))
