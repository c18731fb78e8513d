"""Core compute primitives: dense (fp / INT8), layernorm, activations.

This is the dispatch point where the encoder's matmuls choose between the plain
XLA path (``jnp.dot`` in ``compute_dtype``, accumulating fp32 on the MXU) and the
Pallas fused INT8 dequant+matmul kernel. A "dense param" is a dict pytree:

    fp   : {"w": [in, out], "b": [out] (optional)}
    int8 : {"w_q": int8 [in, out], "scale": f32 [out], "b": [out] (optional)}

The INT8 layout is weight-only per-output-channel symmetric quantization — the
TPU-native equivalent of the reference's ONNX dynamic QUInt8 weights
(reference ONNX_CONVERTING/convert_to_onnx.py:81-89), chosen so dequantization
fuses into the matmul epilogue (scale multiply on the output columns).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# Trace-time switch for DYNAMIC activation quantization (w8a8): set by the
# engine around its jitted forward so the context is active while jax traces
# the step (jit calls the wrapped function with tracers, so the `with` block
# encloses tracing; cached executables keep whatever they were traced with).
# Same pattern as GLICLASS_TPU_ATTN_ROUTE: a static routing decision, never a
# traced value.
_ACT_QUANT = contextvars.ContextVar("gliclass_act_quant", default=False)


@contextlib.contextmanager
def act_quant(enabled: bool):
    """Enable w8a8 (dynamic per-token INT8 activations) for INT8 dense layers
    traced within this context. Reduced-precision serving only — fp32 parity
    mode keeps weight-only INT8 regardless."""
    tok = _ACT_QUANT.set(bool(enabled))
    try:
        yield
    finally:
        _ACT_QUANT.reset(tok)


def linear(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """y = x @ w (+ b). Dispatches on the param-tree structure (static under jit)."""
    if "w_q" in p:
        return _linear_int8(p, x, compute_dtype)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out_dtype = x.dtype
    if out_dtype == jnp.float32:
        # fp32 parity mode: fp32 accumulate AND fp32 bias math, exactly.
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if "b" in p and p["b"] is not None:
            y = y + p["b"].astype(jnp.float32)
        return y
    # Serving dtypes (bf16/f16): native-dtype output. The MXU still accumulates
    # fp32 internally; asking for an fp32 OUTPUT would materialize an fp32
    # [M, N] buffer + a cast pass, measured ~1.7x slower at encoder FFN shapes
    # on v5e (80 -> 137 TFLOP/s). Bias adds in the serving dtype.
    y = jnp.dot(x, w)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(out_dtype)
    return y.astype(out_dtype)


def _linear_int8(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """INT8 matmul: weight-only dequant by default; w8a8 (dynamic per-token
    activation quant + int8xint8 MXU) inside an :func:`act_quant` context.
    Uses the Pallas fused kernel on TPU for MXU-aligned shapes; falls back to
    an XLA epilogue-fused dequant otherwise."""
    from .int8_matmul import int8_matmul

    dtype = compute_dtype or x.dtype
    if _ACT_QUANT.get() and dtype != jnp.float32:
        y = _linear_w8a8(p, x)
    else:
        y = int8_matmul(x.astype(dtype), p["w_q"], p["scale"])
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(jnp.float32 if dtype == jnp.float32 else dtype)
    return y.astype(dtype)


def _linear_w8a8(p: Params, x: jax.Array) -> jax.Array:
    """Dynamic-quantized INT8 matmul: y = (q(x) @ w_q) * s_x * scale.

    Per-token (row) symmetric absmax quantization of the activation, int8xint8
    dot accumulating int32 on the MXU (2x the bf16 matmul peak on v5e:
    394 INT8 TOPS vs 197 bf16 TFLOP/s), both scales applied once in the fused
    epilogue. This is the TPU-native equivalent of ONNX Runtime's
    DynamicQuantizeLinear + MatMulInteger pair that executes the reference's
    dynamically-quantized export (reference ONNX_CONVERTING/
    convert_to_onnx.py:81-89), fused and at native MXU int8 rate.

    Documented divergence (repo convention): ONNX DynamicQuantizeLinear is
    ASYMMETRIC uint8 with a per-tensor zero point; this path is SYMMETRIC
    per-token int8 (no zero point) because the MXU's int8 contraction has no
    zero-point correction term — symmetric scales factor out of the reduction
    exactly. The numerical difference is bounded by the golden-logit selftest
    (max |logit delta| 0.100 measured, gated at 0.15) and the <=0.5% micro-F1
    gate, the same accuracy budget the reference accepts for its quantized
    export at atol 1e-3."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-10)
    x_q = jnp.round(xf / s_x).astype(jnp.int8)  # |x|/s <= 127 by construction
    acc = jax.lax.dot_general(
        x_q,
        p["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s_x * p["scale"].astype(jnp.float32)


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with affine params {"scale","bias"}; stats in fp32 for
    numerical parity with the reference fp32 path."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    """RMSNorm (llama/qwen backbones), fp32 stats."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def _gelu(x):
    """gelu with erf (torch nn.GELU default / ACT2FN["gelu"]) in fp32 — parity
    with HF. In reduced-precision serving the tanh approximation is used:
    max |gelu_tanh - gelu_erf| < 1.5e-3, BELOW bf16's own rounding (~4e-3
    relative at |x|~2), while erf is ~2.6x more VPU time on v5e (3.39 vs 1.32 ms
    at the base FFN intermediate [24576, 3072])."""
    if x.dtype == jnp.float32:
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.gelu(x, approximate=True)


_ACTIVATIONS = {
    "gelu": _gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}


def activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unsupported activation: {name!r}") from None


def masked_softmax(scores: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax in the scores dtype. fp32 input -> exact fp32 softmax (parity
    mode). Reduced precision -> exp in the input dtype with an fp32 max/sum
    (stable), saving the fp32 up-cast round trip over the [B, h, S, S] score
    tensor (1.07 -> 0.80 ms at [256, 12, 96, 96] on v5e). Error is ~1 ulp of
    bf16 on the probabilities — the dtype's own noise floor."""
    if scores.dtype == jnp.float32:
        return jax.nn.softmax(scores, axis=axis)
    m = jnp.max(scores.astype(jnp.float32), axis=axis, keepdims=True)
    e = jnp.exp(scores - m.astype(scores.dtype))
    denom = jnp.sum(e.astype(jnp.float32), axis=axis, keepdims=True)
    return (e.astype(jnp.float32) / denom).astype(scores.dtype)
