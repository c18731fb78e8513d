"""Weight-only INT8 quantization of a parameter tree.

TPU-native analog of the reference's offline dynamic quantization step
(reference ONNX_CONVERTING/convert_to_onnx.py:81-89, QUInt8 weights): symmetric
per-output-channel INT8, computed offline by the converter or on load. Only
matmul kernels ("w" leaves of dense params) are quantized; embeddings, norms and
biases stay in the bundle dtype — matching the reference recipe, which
quantizes MatMul weights only.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: np.ndarray | jax.Array) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel INT8.

    2-D matmul kernel:      w [K, N]    -> (w_q int8 [K, N],    scale f32 [N])
    scan-stacked kernels:   w [L, K, N] -> (w_q int8 [L, K, N], scale f32 [L, N])

    scale[..., n] = max_k |w[..., k, n]| / 127; w_q = round(w / scale). The
    reduction is over axis -2 (the contraction dim), so each stacked layer gets
    its own per-output-channel scales and a ``lax.scan`` slice of (w_q, scale)
    is exactly the 2-D quantization of that layer's kernel — the scan body's
    ``_linear_int8`` runs unchanged. Symmetric (no zero point) so the scale
    commutes with the K-reduction in the fused kernel.
    """
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=-2)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale[..., None, :]), -127, 127).astype(np.int8)
    return w_q, scale


def dequantize_weight(w_q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return w_q.astype(np.float32) * np.asarray(scale, np.float32)[..., None, :]


def quantize_dense_param(p: dict[str, Any]) -> dict[str, Any]:
    """{"w", "b"?} -> {"w_q", "scale", "b"?}."""
    if "w_q" in p:
        return p
    w_q, scale = quantize_weight(np.asarray(p["w"]))
    out = {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale)}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def quantize_tree(
    params: Any, skip_paths: tuple[str, ...] = ("embeddings", "conv")
) -> Any:
    """Recursively quantize every dense param in a model tree.

    Quantizes plain 2-D matmul kernels (the head projectors/scorer) AND the
    scan-stacked 3-D ``[L, K, N]`` encoder-layer kernels (per-layer
    per-output-channel scales) — matching the reference recipe, which quantizes
    every MatMul weight in the graph (reference
    ONNX_CONVERTING/convert_to_onnx.py:81-89).

    ``skip_paths``: any dense param whose path contains one of these substrings
    keeps full precision. Defaults: embedding tables (not matmuls) and the
    deberta-v2 conv stem (``conv_layer`` consumes a [k, H, H] conv kernel
    directly via ``lax.conv_general_dilated`` — not a stacked matmul).
    """

    def rec(node: Any, path: str) -> Any:
        if isinstance(node, dict):
            if ("w" in node) and not any(s in path for s in skip_paths):
                w = node["w"]
                # Matmul kernels: 2-D [K, N] or scan-stacked 3-D [L, K, N].
                if hasattr(w, "ndim") and w.ndim in (2, 3):
                    return quantize_dense_param(node)
            return {k: rec(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(rec(v, f"{path}/{i}") for i, v in enumerate(node))
        return node

    return rec(params, "")
