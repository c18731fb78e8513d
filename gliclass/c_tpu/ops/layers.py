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

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def linear(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """y = x @ w (+ b). Dispatches on the param-tree structure (static under jit)."""
    if "w_q" in p:
        return _linear_int8(p, x, compute_dtype)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype if compute_dtype is None else compute_dtype)


def _linear_int8(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Weight-only INT8 matmul. Uses the Pallas fused kernel on TPU for
    MXU-aligned shapes; falls back to an XLA epilogue-fused dequant otherwise."""
    from .int8_matmul import int8_matmul

    dtype = compute_dtype or x.dtype
    y = int8_matmul(x.astype(dtype), p["w_q"], p["scale"])
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y.astype(dtype)


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


_ACTIVATIONS = {
    # gelu with erf (torch nn.GELU default / ACT2FN["gelu"]) — parity with HF.
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
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
