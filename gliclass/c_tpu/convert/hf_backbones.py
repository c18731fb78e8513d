"""HF (PyTorch) backbone state_dict -> native JAX param trees.

This is part of the offline model-production toolchain (replaces the role of
reference ONNX_CONVERTING/convert_to_onnx.py: turning an HF checkpoint into the
artifact the engine executes). torch is only imported here — never on the
serving hot path.

Naming convention: torch Linear stores weight [out, in]; our dense params store
"w" as [in, out], so every kernel is transposed once at conversion time.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import BackboneConfig

Params = dict[str, Any]


def _t(sd: Mapping[str, Any], name: str) -> np.ndarray:
    t = sd[name]
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _dense(sd, prefix: str, bias: bool = True) -> Params:
    p: Params = {"w": _t(sd, f"{prefix}.weight").T.copy()}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _t(sd, f"{prefix}.bias")
    return p


def _ln(sd, prefix: str) -> Params:
    return {"scale": _t(sd, f"{prefix}.weight"), "bias": _t(sd, f"{prefix}.bias")}


def _stack(layers: list[Params]) -> Params:
    """Stack per-layer trees along a new leading axis (for lax.scan)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def convert_deberta_state_dict(sd: Mapping[str, Any], cfg: BackboneConfig) -> Params:
    """transformers.DebertaV2Model state_dict -> deberta.py param tree."""
    params: Params = {
        "embeddings": {
            "word": _t(sd, "embeddings.word_embeddings.weight"),
            "ln": _ln(sd, "embeddings.LayerNorm"),
        }
    }
    if "embeddings.position_embeddings.weight" in sd:
        params["embeddings"]["pos"] = _t(sd, "embeddings.position_embeddings.weight")
    if "embeddings.embed_proj.weight" in sd:
        params["embeddings"]["proj"] = _dense(sd, "embeddings.embed_proj", bias=False)

    if cfg.relative_attention:
        params["rel_embeddings"] = _t(sd, "encoder.rel_embeddings.weight")
        if cfg.norm_rel_ebd == "layer_norm":
            params["rel_ln"] = _ln(sd, "encoder.LayerNorm")

    if cfg.conv_kernel_size > 0:
        # torch Conv1d weight is [out, in, k]; our conv stem wants WIO [k, in, out].
        params["conv"] = {
            "w": np.transpose(_t(sd, "encoder.conv.conv.weight"), (2, 1, 0)).copy(),
            "b": _t(sd, "encoder.conv.conv.bias"),
            "ln": _ln(sd, "encoder.conv.LayerNorm"),
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}"
        layer = {
            "attn": {
                "q": _dense(sd, f"{pre}.attention.self.query_proj"),
                "k": _dense(sd, f"{pre}.attention.self.key_proj"),
                "v": _dense(sd, f"{pre}.attention.self.value_proj"),
                "o": _dense(sd, f"{pre}.attention.output.dense"),
                "ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
            },
            "ffn": {
                "up": _dense(sd, f"{pre}.intermediate.dense"),
                "down": _dense(sd, f"{pre}.output.dense"),
                "ln": _ln(sd, f"{pre}.output.LayerNorm"),
            },
        }
        if not cfg.share_att_key:
            if f"{pre}.attention.self.pos_key_proj.weight" in sd:
                layer["attn"]["pos_k"] = _dense(sd, f"{pre}.attention.self.pos_key_proj")
            if f"{pre}.attention.self.pos_query_proj.weight" in sd:
                layer["attn"]["pos_q"] = _dense(sd, f"{pre}.attention.self.pos_query_proj")
        layers.append(layer)
    params["layers"] = _stack(layers)
    return params


def convert_llama_state_dict(sd: Mapping[str, Any], cfg: BackboneConfig) -> Params:
    """transformers LlamaModel / Qwen2Model state_dict -> llama.py param tree."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"layers.{i}"
        layers.append(
            {
                "attn": {
                    "q": _dense(sd, f"{pre}.self_attn.q_proj"),
                    "k": _dense(sd, f"{pre}.self_attn.k_proj"),
                    "v": _dense(sd, f"{pre}.self_attn.v_proj"),
                    "o": _dense(sd, f"{pre}.self_attn.o_proj"),
                },
                "attn_norm": {"scale": _t(sd, f"{pre}.input_layernorm.weight")},
                "mlp": {
                    "gate": _dense(sd, f"{pre}.mlp.gate_proj"),
                    "up": _dense(sd, f"{pre}.mlp.up_proj"),
                    "down": _dense(sd, f"{pre}.mlp.down_proj"),
                },
                "mlp_norm": {
                    "scale": _t(sd, f"{pre}.post_attention_layernorm.weight")
                },
            }
        )
    return {
        "embeddings": {"word": _t(sd, "embed_tokens.weight")},
        "layers": _stack(layers),
        "final_norm": {"scale": _t(sd, "norm.weight")},
    }


def llama_config_from_hf(hf_cfg, model_type: str) -> BackboneConfig:
    """transformers LlamaConfig / Qwen2Config -> BackboneConfig."""
    heads = getattr(hf_cfg, "num_attention_heads", 32)
    return BackboneConfig(
        model_type=model_type,
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=heads,
        num_key_value_heads=getattr(hf_cfg, "num_key_value_heads", 0) or heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=getattr(hf_cfg, "max_position_embeddings", 2048),
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_norm_eps=getattr(hf_cfg, "rms_norm_eps", 1e-6),
        attention_bias=bool(getattr(hf_cfg, "attention_bias", False))
        or model_type == "qwen2",
        pad_token_id=getattr(hf_cfg, "pad_token_id", 0) or 0,
        tie_word_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
    )


def backbone_config_from_hf(hf_cfg) -> BackboneConfig:
    """transformers DebertaV2Config -> BackboneConfig.

    Every optional field falls back to the transformers DebertaV2Config
    default, so this also accepts partially-specified configs (e.g. a nested
    ``encoder_config`` dict wrapped in a namespace)."""
    pos_att = getattr(hf_cfg, "pos_att_type", None) or ()
    if isinstance(pos_att, str):
        # transformers accepts the "p2c|c2p" string form too.
        pos_att = [p.strip() for p in pos_att.split("|") if p.strip()]
    return BackboneConfig(
        model_type="deberta-v2",
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        hidden_act=getattr(hf_cfg, "hidden_act", "gelu"),
        max_position_embeddings=getattr(hf_cfg, "max_position_embeddings", 512),
        layer_norm_eps=getattr(hf_cfg, "layer_norm_eps", 1e-7),
        pad_token_id=getattr(hf_cfg, "pad_token_id", 0) or 0,
        relative_attention=getattr(hf_cfg, "relative_attention", False),
        position_buckets=getattr(hf_cfg, "position_buckets", -1),
        max_relative_positions=getattr(hf_cfg, "max_relative_positions", -1),
        pos_att_type=tuple(pos_att),
        share_att_key=getattr(hf_cfg, "share_att_key", False),
        norm_rel_ebd=getattr(hf_cfg, "norm_rel_ebd", "none"),
        position_biased_input=getattr(hf_cfg, "position_biased_input", True),
        conv_kernel_size=getattr(hf_cfg, "conv_kernel_size", 0) or 0,
        conv_act=getattr(hf_cfg, "conv_act", "tanh") or "tanh",
    )


def backbone_config_from_hf_dict(enc: Mapping[str, Any]) -> BackboneConfig:
    """Nested ``encoder_config`` dict (as serialized inside a published HF
    gliclass ``config.json``) -> BackboneConfig.

    The real checkpoints embed the full transformers config of the encoder
    under ``encoder_config`` with a ``model_type`` discriminator (the composite
    config the reference's exporter loads via ``GLiClassModel.from_pretrained``,
    reference ONNX_CONVERTING/convert_to_onnx.py:48-52). Dispatch on
    ``model_type`` and reuse the attribute-based converters via a namespace
    wrapper — no transformers import needed."""
    from types import SimpleNamespace

    model_type = enc.get("model_type", "deberta-v2")
    ns = SimpleNamespace(**{k: v for k, v in enc.items() if v is not None})
    if model_type == "deberta-v2":
        return backbone_config_from_hf(ns)
    if model_type in ("llama", "qwen2"):
        return llama_config_from_hf(ns, model_type)
    raise ValueError(
        f"unsupported encoder_config model_type: {model_type!r} "
        "(supported: deberta-v2, llama, qwen2)"
    )
