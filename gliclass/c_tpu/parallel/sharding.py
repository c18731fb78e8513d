"""Parameter partition specs: tensor parallelism over the "model" mesh axis.

Megatron-style TP for the encoder, expressed as per-leaf ``PartitionSpec``s that
XLA's SPMD partitioner turns into sharded matmuls + ICI collectives:

  * QKV / FFN-up / projector-in kernels shard their OUTPUT dim (column
    parallel) — each TP rank computes a head/neuron slice locally;
  * attention-out / FFN-down / projector-out kernels shard their INPUT dim
    (row parallel) — the following all-reduce is the layer's only collective;
  * norms, biases of row-parallel layers, embeddings and the scoring head's
    small tensors are replicated.

Specs are derived from the param-tree PATH (the converter's naming is the
contract), so the same rules cover fp32/bf16 and INT8 bundles (w_q shards like
w; per-output-channel scales shard like the output dim).

The reference has nothing comparable — its entire parallelism is OpenMP host
threads (reference src/parallel_processor.c:28); this module is the capability
addition that makes >1-chip serving work (SURVEY §2 parallelism notes).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

Params = dict[str, Any]

# Parent-module names whose kernels are column-parallel (shard output dim)
# vs row-parallel (shard input dim).
_COL_PARALLEL = {"q", "k", "v", "qkv", "pos_q", "pos_k", "up", "gate", "linear_1", "mlp_1"}
_ROW_PARALLEL = {"o", "down", "linear_2", "mlp_2"}


def _leaf_spec(path: tuple[str, ...], ndim: int) -> P:
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    def last_dim_model() -> P:
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))

    def second_last_dim_model() -> P:
        return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))

    if name in ("w", "w_q"):
        if parent in _COL_PARALLEL:
            return last_dim_model()
        if parent in _ROW_PARALLEL:
            return second_last_dim_model()
        return P()
    if name in ("b", "scale") and parent in _COL_PARALLEL:
        # bias / quant-scale lives on the output dim
        return last_dim_model()
    return P()


def _tree_paths(tree: Any, prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def param_pspecs(params: Params) -> Params:
    """PartitionSpec tree mirroring ``params``."""
    out: Params = {}
    for path, leaf in _tree_paths(params):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _leaf_spec(path, getattr(leaf, "ndim", 0))
    return out


def _divisible(leaf, spec: P, tp: int) -> bool:
    for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * (leaf.ndim - len(spec))):
        if axis == MODEL_AXIS and dim % tp != 0:
            return False
    return True


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place every leaf with its TP sharding (replicating any leaf whose
    sharded dim does not divide by the TP size).

    On a multi-process mesh every host holds the full tree (same bundle on
    disk), so each leaf is assembled as a global array from the host-local
    copy instead of device_put (which requires addressable-only shardings)."""
    import numpy as np

    tp = mesh.shape[MODEL_AXIS]
    specs = param_pspecs(params)
    multiprocess = any(
        d.process_index != jax.process_index()
        for d in np.asarray(mesh.devices).flat
    )

    def place(leaf, spec):
        if tp > 1 and not _divisible(leaf, spec, tp):
            spec = P()
        sh = NamedSharding(mesh, spec)
        if multiprocess:
            host = np.asarray(leaf)
            return jax.make_array_from_process_local_data(sh, host, host.shape)
        return jax.device_put(leaf, sh)

    return jax.tree.map(place, params, specs)


def shard_spec_tree(params: Params, mesh: Mesh) -> Params:
    """NamedSharding tree (for jit in_shardings / orbax restore)."""
    tp = mesh.shape[MODEL_AXIS]
    specs = param_pspecs(params)

    def mk(leaf, spec):
        if tp > 1 and not _divisible(leaf, spec, tp):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(mk, params, specs)
