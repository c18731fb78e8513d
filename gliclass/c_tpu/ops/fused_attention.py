"""Fused disentangled attention (DeBERTa) as a single Pallas TPU kernel.

The XLA formulation of DeBERTa attention materializes several [B, h, S, S]- and
[B, h, S, 2S-1]-sized tensors in HBM per layer (content scores, c2p/p2c bias,
softmax probabilities) — at serving shapes that traffic, not FLOPs, dominates
the step time. This kernel keeps everything for a group of g heads of one batch
row in VMEM:

    qk    = q @ k^T                      (MXU, fp32 accumulate)
    qp    = q @ pos_k_rel^T              [g, S, 2S-1]  (relative axis)
    kp    = k @ pos_q_rel^T              [g, S, 2S-1]
    c2p   = skew(qp)                     c2p[., i, j] = qp[., i, j - i + S - 1]
    p2c   = skew(kp)^T                   p2c[., i, j] = kp[., j, i - j + S - 1]
    s     = (qk + c2p + p2c) / sqrt(3d)  + key-mask
    out   = softmax_fp32(s) @ v

The skew is synthesized from log2(S) static rolls (binary decomposition of the
per-row rotation) — all vectorized VPU ops; Mosaic has no unaligned dynamic
lane slicing. Numerics match the XLA path: fp32 score accumulation, fp32
softmax, bf16 probabilities into the PV matmul.

Grouping g heads per grid program amortizes the per-program overhead that made
the one-(batch,head)-per-program version lose to XLA at S=128; g adapts to the
~16 MB/core VMEM budget (largest divisor of h that fits), so S=512 falls back
to small groups automatically. Buckets beyond MAX_FUSED_SEQ use the XLA path.
pos_k_rel/pos_q_rel are the column-taken position tables produced in
models/deberta.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_SEQ = 512

# VMEM working-set budget per grid program (bytes). ~16MB/core total; leave
# room for Pallas double-buffering of the streamed blocks.
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_group(h: int, S: int, d: int, W: int) -> int:
    """Largest divisor g of h whose block + intermediate bytes fit the budget."""
    for g in range(h, 0, -1):
        if h % g:
            continue
        blocks = 2 * g * (3 * S * d * 2 + 2 * W * d * 2 + S * d * 2)  # 2x: pipelining
        interm = g * (3 * S * W * 4 + 2 * S * S * 4)  # qp/kp/roll temp + scores/probs
        if blocks + interm <= _VMEM_BUDGET:
            return g
    return 1


def _skew(rel: jax.Array, S: int) -> jax.Array:
    """[g, S, 2S-1] -> [g, S, S]: out[., i, j] = rel[., i, j - i + S - 1].

    Row i needs the S-wide window starting at lane S-1-i. Compose a static
    left-rotation by S-1 with a PER-ROW right-rotation by i, synthesized from
    log2(S) static rolls + row-masked selects (binary decomposition of the row
    index). Rotation is modular, and every needed final index lies in
    [0, 2S-2], so no wrapped element ever lands in the returned window.
    """
    y = jnp.roll(rel, -(S - 1), axis=-1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 2)
    b = 1
    while b < S:
        y = jnp.where((row_ids & b) != 0, jnp.roll(y, b, axis=-1), y)
        b *= 2
    return y[..., :S]


def _kernel(q_ref, k_ref, v_ref, posk_ref, posq_ref, mask_ref, o_ref, *, scale):
    S = q_ref.shape[2]
    q = q_ref[0]  # [g, S, d]
    k = k_ref[0]
    v = v_ref[0]

    bdn = (((2,), (2,)), ((0,), (0,)))  # batched over g, contract d
    qk = jax.lax.dot_general(q, k, bdn, preferred_element_type=jnp.float32)
    qp = jax.lax.dot_general(
        q, posk_ref[:], bdn, preferred_element_type=jnp.float32
    )  # [g, S, 2S-1] relative axis
    kp = jax.lax.dot_general(
        k, posq_ref[:], bdn, preferred_element_type=jnp.float32
    )

    # p2c[., i, j] = kp[., j, i - j + S - 1] = skew(kp)[., j, i] -> transpose.
    scores = (qk + _skew(qp, S) + jnp.swapaxes(_skew(kp, S), 1, 2)) * (1.0 / scale)

    key_ok = mask_ref[0, 0] > 0  # [S]
    scores = jnp.where(key_ok[None, None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    pv = (((2,), (1,)), ((0,), (0,)))
    ctx = jax.lax.dot_general(
        p.astype(v.dtype), v, pv, preferred_element_type=jnp.float32
    )
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "g"))
def _fused_call(q, k, v, posk, posq, mask, scale, g):
    B, h, S, d = q.shape
    W = posk.shape[1]
    grid = (B, h // g)

    def qkv_spec():
        return pl.BlockSpec(
            (1, g, S, d), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM
        )

    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            qkv_spec(),
            qkv_spec(),
            qkv_spec(),
            pl.BlockSpec((g, W, d), lambda b, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, W, d), lambda b, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec(),
        out_shape=jax.ShapeDtypeStruct((B, h, S, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * h * S * (S * d * 2 + W * d * 2),
            bytes_accessed=B * h * S * d * 3 * 2 + B * h * S * d * 2,
            transcendentals=B * h * S * S,
        ),
        interpret=interpret,
    )(q, k, v, posk, posq, mask)


def fused_disentangled_attention(
    q: jax.Array,  # [B, h, S, d]
    k: jax.Array,
    v: jax.Array,
    pos_k_rel: jax.Array,  # [h, 2S-1, d]
    pos_q_rel: jax.Array,  # [h, 2S-1, d]
    attention_mask: jax.Array,  # [B, S] (1 = valid key)
    scale: float,
) -> jax.Array:
    """Returns context [B, h, S, d] in q.dtype."""
    B, h, S, d = q.shape
    W = pos_k_rel.shape[1]
    g = _pick_group(h, S, d, W)
    return _fused_call(
        q, k, v, pos_k_rel, pos_q_rel,
        attention_mask.astype(jnp.int32)[:, None, :], scale, g,
    )


def fusable(S: int, d: int, compute_dtype) -> bool:
    import os

    if os.environ.get("GLICLASS_TPU_DISABLE_FUSED_ATTN") == "1":
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if os.environ.get("GLICLASS_TPU_FORCE_FUSED_ATTN") == "1":
        return on_tpu and S <= MAX_FUSED_SEQ and S % 8 == 0 and d % 8 == 0
    # Measured on v5e (gliclass-base, B=128, full engine step): with head
    # grouping the kernel wins 1.6x at S=256 and 2.1x at S=512 vs the XLA
    # Toeplitz path, but still loses ~11% at S=128 (skew roll overhead vs
    # XLA's already-cheap pad/reshape skew at that size) — engage at S >= 256.
    return (
        on_tpu
        and 256 <= S <= MAX_FUSED_SEQ
        and S % 128 == 0
        and d % 8 == 0
    )
