"""GLiClassModel: backbone encoder + scoring head, one jittable forward.

The TPU-native replacement for the reference's opaque ONNX session
(reference src/model.c:122-207): input_ids + attention_mask in, per-label logits
out — same I/O contract as the exported graph
(reference ONNX_CONVERTING/convert_to_onnx.py:63-79: inputs input_ids/
attention_mask, output logits), but as a transparent, shardable JAX function.

Zero-shot classification stays a SINGLE forward pass per text (the defining
design property of GLiClass; reference Readme.md:4): labels ride in the prompt,
so there is no per-label cross-encoding, no KV cache, no decode loop.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import GLiClassConfig
from .deberta import deberta_encode, init_deberta_params
from .heads import gliclass_head, init_head_params

Params = dict[str, Any]


def encode_backbone(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GLiClassConfig,
    compute_dtype,
    return_all_layers: bool = False,
) -> jax.Array:
    bb = cfg.backbone
    if bb.model_type == "deberta-v2":
        return deberta_encode(
            params, input_ids, attention_mask, bb, compute_dtype,
            return_all_layers=return_all_layers,
        )
    if bb.model_type in ("llama", "qwen2"):
        from .llama import llama_encode

        return llama_encode(
            params, input_ids, attention_mask, bb, compute_dtype,
            return_all_layers=return_all_layers,
        )
    raise ValueError(f"unsupported backbone model_type: {bb.model_type!r}")


def gliclass_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GLiClassConfig,
    max_labels: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """[B,S] ids + mask -> fp32 logits [B, max_labels].

    ``max_labels`` is static (a label-count bucket) so XLA sees fixed shapes.
    """
    if cfg.architecture_type != "uni-encoder":
        raise ValueError(
            f"unsupported architecture_type: {cfg.architecture_type!r} "
            "(the exporter enforces uni-encoder too; reference "
            "ONNX_CONVERTING/convert_to_onnx.py:48-52)"
        )
    if cfg.squeeze_layers:
        # LayersFuser: softmax-weighted mix of all encoder states.
        from .heads import fuse_layers

        states = encode_backbone(
            params["backbone"], input_ids, attention_mask, cfg, compute_dtype,
            return_all_layers=True,
        )
        hidden = fuse_layers(params["layers_fuser"], states)
    else:
        hidden = encode_backbone(
            params["backbone"], input_ids, attention_mask, cfg, compute_dtype
        )
    if cfg.use_lstm:
        # LstmSeq2SeqEncoder: BiLSTM refinement of the encoder states.
        from .heads import bilstm

        hidden = bilstm(params["lstm"], hidden, attention_mask)
    logits, _ = gliclass_head(
        params["head"], hidden, input_ids, attention_mask, cfg, max_labels,
        compute_dtype,
    )
    return logits


def gliclass_probs(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GLiClassConfig,
    max_labels: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Forward + in-graph sigmoid (reference src/postprocessor.c:14-16 runs
    sigmoid on host; here it fuses into the XLA graph)."""
    logits = gliclass_forward(
        params, input_ids, attention_mask, cfg, max_labels, compute_dtype
    )
    return jax.nn.sigmoid(logits)


def init_gliclass_params(key, cfg: GLiClassConfig, dtype=jnp.float32) -> Params:
    kb, kh = jax.random.split(key)
    bb = cfg.backbone
    if bb.model_type == "deberta-v2":
        backbone = init_deberta_params(kb, bb, dtype)
    elif bb.model_type in ("llama", "qwen2"):
        from .llama import init_llama_params

        backbone = init_llama_params(kb, bb, dtype)
    else:
        raise ValueError(f"unsupported backbone model_type: {bb.model_type!r}")
    params = {"backbone": backbone, "head": init_head_params(kh, cfg, dtype)}
    if cfg.use_lstm:
        from .heads import init_lstm_params

        params["lstm"] = init_lstm_params(
            jax.random.fold_in(kh, 1), cfg.hidden_size, dtype
        )
    if cfg.squeeze_layers:
        params["layers_fuser"] = {
            "weights": jnp.zeros((cfg.backbone.num_hidden_layers + 1,), dtype)
        }
    return params
