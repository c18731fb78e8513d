"""Multi-host bootstrap for pod-slice serving/training.

The reference is strictly single-process (SURVEY §2: no distributed backend of
any kind). For >1-host TPU slices the JAX runtime needs one process per host,
bootstrapped with ``jax.distributed.initialize``; after that, ``jax.devices()``
spans the whole slice and the same mesh/pjit code paths work unchanged —
collectives ride ICI inside a slice and DCN across slices.

Serving topology: each TP group forms one model replica; replicas are data
parallel. Requests are routed host-locally (every host runs its own
StreamingScheduler over the global mesh's addressable shard) — no cross-host
request plane is required for throughput scaling, because batches are
embarrassingly parallel across replicas.
"""

from __future__ import annotations

import os


def initialize_from_env() -> bool:
    """Initialize jax.distributed from standard env vars if they are present.

    Reads COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (or their JAX
    defaults on Cloud TPU, where initialize() autodetects). Returns True if
    distributed mode was initialized.
    """
    import jax

    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        return True
    if os.environ.get("GLICLASS_TPU_AUTO_DISTRIBUTED") == "1":
        # Cloud TPU pod slice: initialize() autodetects from the metadata
        # server / TPU env vars.
        jax.distributed.initialize()
        return True
    return False


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
