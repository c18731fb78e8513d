"""Training checkpoint save/restore via Orbax.

The reference needs no checkpoints (stateless inference; SURVEY §5) — this
serves the training subsystem: periodic TrainState snapshots that restore with
the correct shardings on any mesh (orbax restores to the target shardings
directly, so a checkpoint written on one mesh shape can be loaded on another).
"""

from __future__ import annotations

import os
from typing import Any

from .train import TrainState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state: TrainState) -> None:
    import jax

    path = os.path.abspath(path)
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    _ckptr().save(path, jax.tree.map(lambda x: x, tree), force=True)


def restore_train_state(
    path: str,
    like: TrainState,
    shardings: Any | None = None,
) -> TrainState:
    """Restore into the structure (and optionally shardings) of ``like``."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    template = {
        "params": like.params,
        "opt_state": like.opt_state,
        "step": like.step,
    }
    if shardings is not None:
        restore_args = jax.tree.map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings
        )
        tree = _ckptr().restore(path, item=template, restore_args=restore_args)
    else:
        tree = _ckptr().restore(path, item=template)
    return TrainState(tree["params"], tree["opt_state"], tree["step"])
