"""Fused disentangled attention (DeBERTa) as a single Pallas TPU kernel.

The XLA formulation of DeBERTa attention materializes several [B, h, S, S]- and
[B, h, S, 2S-1]-sized tensors in HBM per layer (content scores, c2p/p2c bias,
softmax probabilities) — at serving shapes that traffic, not FLOPs, dominates
the step time. This kernel keeps everything for one (batch, head) instance in
VMEM:

    qk    = q @ k^T                      (MXU, fp32 accumulate)
    qp    = q @ pos_k_rel^T              [S, 2S-1]  (relative axis)
    kp    = k @ pos_q_rel^T              [S, 2S-1]
    c2p   = skew(qp)                     c2p[i, j] = qp[i, j - i + S - 1]
    p2c   = skew(kp)^T                   p2c[i, j] = kp[j, i - j + S - 1]
    s     = (qk + c2p + p2c) / sqrt(3d)  + key-mask
    out   = softmax_fp32(s) @ v

The skew is S dynamic row-slices inside VMEM (cheap vector moves), the exact
in-kernel analog of models/deberta.rel_to_abs. Numerics match the XLA path:
fp32 score accumulation, fp32 softmax, bf16 probabilities into the PV matmul.

Used for self-attention with S <= 512 (whole-S tiles fit VMEM comfortably);
larger buckets fall back to the XLA path. pos_k_rel/pos_q_rel are the
column-taken position tables produced in models/deberta.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_SEQ = 512


def _skew(rel: jax.Array, S: int) -> jax.Array:
    """[S, 2S-1] -> [S, S]: out[i, j] = rel[i, j - i + S - 1].

    Row i needs the S-wide window starting at lane S-1-i. Compose a static
    left-rotation by S-1 with a PER-ROW right-rotation by i, synthesized from
    log2(S) static rolls + row-masked selects (binary decomposition of the row
    index) — all vectorized VPU ops; Mosaic has no unaligned dynamic lane
    slicing. Rotation is modular, and every needed final index lies in
    [0, 2S-2], so no wrapped element ever lands in the returned window.
    """
    W = rel.shape[-1]  # 2S-1
    y = jnp.roll(rel, -(S - 1), axis=1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
    b = 1
    while b < S:
        y = jnp.where((row_ids & b) != 0, jnp.roll(y, b, axis=1), y)
        b *= 2
    return y[:, :S]


def _kernel(q_ref, k_ref, v_ref, posk_ref, posq_ref, mask_ref, o_ref, *, scale):
    S = q_ref.shape[1]
    q = q_ref[0]  # [S, d]
    k = k_ref[0]
    v = v_ref[0]

    dn = (((1,), (1,)), ((), ()))  # contract the d axis of both operands
    qk = jax.lax.dot_general(q, k, dn, preferred_element_type=jnp.float32)

    qp = jax.lax.dot_general(
        q, posk_ref[0], dn, preferred_element_type=jnp.float32
    )  # [S, 2S-1] relative axis
    kp = jax.lax.dot_general(
        k, posq_ref[0], dn, preferred_element_type=jnp.float32
    )

    # p2c[i, j] = kp[j, i - j + S - 1] = skew(kp)[j, i] -> transpose.
    scores = (qk + _skew(qp, S) + _skew(kp, S).T) * (1.0 / scale)

    key_ok = mask_ref[0, 0] > 0  # [S]
    scores = jnp.where(key_ok[None, :], scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    ctx = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _fused_call(q, k, v, posk, posq, mask, scale):
    BH, S, d = q.shape
    h = posk.shape[0]
    B = BH // h
    grid = (BH,)

    def qkv_spec():
        return pl.BlockSpec((1, S, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    W = posk.shape[1]
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
            pl.BlockSpec((1, W, d), lambda i: (i % h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, d), lambda i: (i % h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i: (i // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec(),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * S * (S * d * 2 + W * d * 2),
            bytes_accessed=BH * S * d * 3 * 2 + BH * S * d * 2,
            transcendentals=BH * S * S,
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
    q2 = q.reshape(B * h, S, d)
    k2 = k.reshape(B * h, S, d)
    v2 = v.reshape(B * h, S, d)
    ctx = _fused_call(
        q2, k2, v2, pos_k_rel, pos_q_rel,
        attention_mask.astype(jnp.int32)[:, None, :], scale,
    )
    return ctx.reshape(B, h, S, d)


def fusable(S: int, d: int, compute_dtype) -> bool:
    import os

    if os.environ.get("GLICLASS_TPU_DISABLE_FUSED_ATTN") == "1":
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    # Measured on v5e (gliclass-base): the fused kernel wins 1.9x at S=256 and
    # 3.7x at S=512 (where XLA materializes huge score/bias tensors), but the
    # fine (B*h)-grid overhead loses to XLA at S=128. Engage at S >= 256.
    return (
        on_tpu
        and 256 <= S <= MAX_FUSED_SEQ
        and S % 128 == 0
        and d % 8 == 0
    )
