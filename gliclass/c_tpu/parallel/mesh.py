"""Device mesh construction for the serving/training engine.

The reference has no distributed parallelism of any kind (SURVEY §2: OpenMP
threads + one optional mutex-serialized GPU, reference main.c:141-150). Here the
parallelism model is a 3-D ``jax.sharding.Mesh``:

    ("data", "seq", "model"): data-parallel replicas x sequence-parallel
    shards x tensor-parallel shards

Tensor-parallel collectives ride ICI within a slice (innermost axis = closest
links); sequence parallelism shards the token axis of activations for
long-context jobs (reranker mode: many labels x long documents), with XLA's
SPMD partitioner inserting the k/v all-gathers attention needs; data
parallelism is embarrassingly parallel over requests. Encoder-only serving
needs no pipeline or expert axes (SURVEY §2: "PP/EP are not applicable to
these small encoder checkpoints") — scaling beyond TP/SP is by adding
data-parallel replicas.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Build a (data, seq, model) mesh from ``dp * sp * tp`` devices.

    With ``devices=None``, uses the first dp*sp*tp of ``jax.devices()``. TP
    groups are laid out over adjacent devices so their (per-layer, latency-
    sensitive) collectives stay on the fastest links; SP groups are next-
    adjacent; DP replicas are outermost (gradient all-reduce / request routing
    tolerate the slowest links).
    """
    if devices is None:
        devices = jax.devices()
    n = dp * sp * tp
    if len(devices) < n:
        raise ValueError(
            f"mesh {dp}x{sp}x{tp} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def seq_sharding(mesh: Mesh, seq_len: int | None = None) -> NamedSharding:
    """[B, S] sharding: batch over data, tokens over the seq axis.

    With ``seq_len`` given, falls back to seq-replicated when the length does
    not divide the seq axis (jit in_shardings require divisibility)."""
    sp = mesh.shape[SEQ_AXIS]
    if sp > 1 and (seq_len is None or seq_len % sp == 0):
        return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS, None))


def stack_sharding(mesh: Mesh, seq_len: int | None = None) -> NamedSharding:
    """[nb, B, S] sharding for stacked (scan-over-batches) steps: the stack
    axis is the device-side loop (replicated); batch/tokens shard as in
    :func:`seq_sharding`."""
    sp = mesh.shape[SEQ_AXIS]
    if sp > 1 and (seq_len is None or seq_len % sp == 0):
        return NamedSharding(mesh, P(None, DATA_AXIS, SEQ_AXIS))
    return NamedSharding(mesh, P(None, DATA_AXIS, None))
