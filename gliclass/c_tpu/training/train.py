"""GLiClass fine-tuning: sharded train step (dp x tp) with BCE / focal loss.

The reference is inference-only; training lives upstream in the HF ``gliclass``
package (whose checkpoints the exporter consumes, reference
ONNX_CONVERTING/convert_to_onnx.py:48-52). A TPU-native framework that replaces
the whole stack needs the training side too: this module provides the loss
(multi-label BCE-with-logits over valid label slots, optional focal weighting —
the gliclass package's focal_loss_alpha/gamma knobs) and a pjit-sharded
train step: parameters tensor-parallel over "model", batch data-parallel over
"data", gradients all-reduced by XLA across the data axis automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import GLiClassConfig
from ..models.gliclass import gliclass_forward
from ..parallel.mesh import DATA_AXIS, Mesh, NamedSharding, P

Params = dict[str, Any]


@dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array


def multilabel_loss(
    logits: jax.Array,  # [B, L] f32 (padded slots are NEG_LOGIT)
    targets: jax.Array,  # [B, L] f32 in {0, 1}
    label_mask: jax.Array,  # [B, L] bool — valid label slots
    focal_alpha: float = -1.0,
    focal_gamma: float = -1.0,
) -> jax.Array:
    """Masked mean BCE-with-logits; optional focal re-weighting."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(logits, targets)
    if focal_gamma > 0:
        p = jax.nn.sigmoid(logits)
        p_t = p * targets + (1 - p) * (1 - targets)
        per = per * (1 - p_t) ** focal_gamma
        if focal_alpha >= 0:
            alpha_t = focal_alpha * targets + (1 - focal_alpha) * (1 - targets)
            per = per * alpha_t
    m = label_mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_train_step(
    cfg: GLiClassConfig,
    optimizer: optax.GradientTransformation,
    max_labels: int,
    compute_dtype=jnp.float32,
    focal_alpha: float = -1.0,
    focal_gamma: float = -1.0,
    accum_steps: int = 1,
) -> Callable:
    """Returns step(state, ids, mask, targets, target_mask) -> (state, metrics).

    ``accum_steps`` > 1 enables gradient accumulation: the leading batch axis
    must be ``accum_steps * microbatch``; the step scans the microbatches
    (``lax.scan`` — ONE compiled body regardless of accum depth, activation
    memory bounded by one microbatch), averages grads/metrics, and applies a
    single optimizer update. Mixed precision: pass
    ``compute_dtype=jnp.bfloat16`` — parameters and optimizer moments stay
    fp32 (ops.linear casts per-matmul), losses/grads accumulate fp32."""

    def loss_fn(params, ids, mask, targets, target_mask):
        logits = gliclass_forward(params, ids, mask, cfg, max_labels, compute_dtype)
        loss = multilabel_loss(logits, targets, target_mask, focal_alpha, focal_gamma)
        preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        m = target_mask.astype(jnp.float32)
        acc = jnp.sum((preds == targets) * m) / jnp.maximum(jnp.sum(m), 1.0)
        return loss, acc

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, ids, mask, targets, target_mask):
        if accum_steps == 1:
            (loss, acc), grads = grad_fn(
                state.params, ids, mask, targets, target_mask
            )
        else:
            B = ids.shape[0]
            if B % accum_steps:
                raise ValueError(
                    f"batch {B} not divisible by accum_steps {accum_steps}"
                )
            mb = B // accum_steps

            def split(a):
                return a.reshape(accum_steps, mb, *a.shape[1:])

            micro = tuple(split(a) for a in (ids, mask, targets, target_mask))
            zero = jax.tree.map(jnp.zeros_like, state.params)

            def body(carry, xs):
                g_acc, l_acc, a_acc = carry
                (l, a), g = grad_fn(state.params, *xs)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l, a_acc + a), None

            (grads, loss, acc), _ = jax.lax.scan(
                body, (zero, jnp.zeros(()), jnp.zeros(())), micro
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, acc = loss * inv, acc * inv
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "accuracy": acc, "grad_norm": gnorm},
        )

    return step


def make_sharded_train_step(
    cfg: GLiClassConfig,
    optimizer: optax.GradientTransformation,
    max_labels: int,
    mesh: Mesh,
    compute_dtype=jnp.float32,
    accum_steps: int = 1,
) -> Callable:
    """jit the train step for a (dp, tp) mesh.

    Shardings ride on the input arrays: initialize the state from
    TP-sharded params (``init_sharded_train_state``) — Adam moments inherit the
    param shardings through ``optimizer.init`` — and shard batches over the
    data axis with ``shard_batch``. XLA then inserts the data-axis gradient
    all-reduce and the model-axis TP collectives automatically.
    """
    step = make_train_step(
        cfg, optimizer, max_labels, compute_dtype, accum_steps=accum_steps
    )
    return jax.jit(step, donate_argnums=(0,))


def shard_batch(mesh: Mesh, ids, mask, *rest):
    """Place batch arrays on the mesh: ids/mask [B, S] over (data, seq) —
    token-axis sequence parallelism when the mesh has an sp axis and S divides
    it — targets/label-mask [B, L] over data only."""
    from ..parallel.mesh import seq_sharding

    tok_sh = seq_sharding(mesh, ids.shape[1])
    row_sh = NamedSharding(mesh, P(DATA_AXIS, None))
    out = (jax.device_put(ids, tok_sh), jax.device_put(mask, tok_sh)) + tuple(
        jax.device_put(a, row_sh) for a in rest
    )
    return out if len(out) > 1 else out[0]


def init_sharded_train_state(
    params: Params, optimizer: optax.GradientTransformation, mesh: Mesh
) -> TrainState:
    """Shard params over the mesh, then init the optimizer ON the sharded
    params so every moment tensor is born with the same TP sharding."""
    from ..parallel.sharding import shard_params

    sharded = shard_params(params, mesh)
    opt_state = jax.jit(optimizer.init)(sharded)
    step = jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P()))
    return TrainState(sharded, opt_state, step)


def init_train_state(
    params: Params, optimizer: optax.GradientTransformation
) -> TrainState:
    opt_state = optimizer.init(params)
    step = jnp.zeros((), jnp.int32)
    return TrainState(params, opt_state, step)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, ch: TrainState(*ch),
)
