"""Runtime and model configuration for the TPU-native GLiClass engine.

The reference engine (GLiClass.c) splits configuration across three static tiers:
compile-time macros (reference include/configs.h:4-7), CLI argv (reference main.c:54-67),
and the exported model's config.json (reference ONNX_CONVERTING/convert_to_onnx.py:19-28).
Here everything is a runtime dataclass: one :class:`RuntimeConfig` for engine knobs and
one :class:`GLiClassConfig` (+ backbone config) shipped inside the weight bundle.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


# Defaults mirror reference include/configs.h:4-7 (BATCH_SIZE 8, MAX_LENGTH 2048,
# THRESHOLD 0.5f, NUM_THREADS 8) but are runtime-configurable, not compile-time.
DEFAULT_BATCH_SIZE = 8
DEFAULT_MAX_LENGTH = 2048
DEFAULT_THRESHOLD = 0.5


@dataclass(frozen=True)
class RuntimeConfig:
    """Engine knobs (replaces reference include/configs.h + argv contract).

    ``prompt_first`` mirrors the second CLI argument of the reference binary
    (reference main.c:54-67); in this framework it normally comes from the model
    bundle's config and can be overridden here.
    """

    batch_size: int = DEFAULT_BATCH_SIZE
    max_length: int = DEFAULT_MAX_LENGTH
    threshold: float = DEFAULT_THRESHOLD
    # XLA wants static shapes: pad each batch up to the nearest of these buckets
    # instead of the reference's pad-to-batch-max (reference src/tokenizer.c:44-54),
    # which would trigger one recompile per distinct batch max-length. Finer
    # buckets at short lengths cut padding waste where most prompts live; each
    # bucket costs one (cached) compile. TUNE TO YOUR LENGTH DISTRIBUTION
    # AND WORKLOAD SHAPE: measured on v5e (r4, prompts p10/50/90 = 51/70/91
    # tokens), a ~16-token ladder through the populated range lifted BATCH
    # jobs 6,703 -> 7,865 texts/s (bench.py uses (56,72,88,104,120,128,...));
    # an 8-token ladder was WORSE (ragged tail batches). For STREAMING
    # serving the opposite holds: fine ladders fragment each micro-batch
    # round across buckets into small row-bucketed steps (measured 51 vs
    # 279 texts/s HTTP steady state) — keep serving configs coarse.
    seq_buckets: tuple[int, ...] = (64, 96, 128, 192, 256, 384, 512, 1024, 2048)
    # Bucketing for the number of candidate labels per text (scoring-head width).
    label_buckets: tuple[int, ...] = (4, 8, 16, 32, 64)
    # "float32" for parity testing, "bfloat16" for TPU serving.
    compute_dtype: str = "bfloat16"
    # "none" (use bundle dtype) | "int8" (weight-only INT8 dequant fused into
    # the matmul) | "int8-dynamic" (w8a8: dynamic per-token INT8 activations +
    # int8xint8 MXU dot, 2x the bf16 matmul peak on v5e — the reference's ONNX
    # dynamic-quantization execution mode, DynamicQuantizeLinear+MatMulInteger)
    quant_mode: str = "none"
    # Mesh axes sizes: data parallel x sequence parallel x model (tensor)
    # parallel. (1, 1, 1) = single chip. SP shards the token axis of
    # activations (long-context/reranker jobs); buckets not divisible by
    # sp_size run seq-replicated.
    dp_size: int = 1
    tp_size: int = 1
    sp_size: int = 1
    # Tokenization host-parallelism.
    tokenizer_workers: int = 8
    # Overlap tokenization with device execution. The streamed plan (dispatch
    # each bucket's batch as soon as it fills, scheduler.plan_and_run_
    # overlapped) is on by default: tokenize and dispatch share ONE thread, so
    # it cannot GIL-starve dispatch even on a 2-CPU host (the inversion that
    # earlier auto-disabled overlap was multi-threaded tokenize racing the
    # dispatch thread — see effective_tokenizer_workers). "off" restores the
    # barrier plan (tokenize everything, then dispatch; the reference's
    # three-phase design, main.c:116-155).
    overlap_tokenize: str = "auto"  # auto | on | off

    def overlap_enabled(self) -> bool:
        return self.overlap_tokenize != "off"

    def effective_tokenizer_workers(self) -> int:
        """Tokenizer threads for the streamed (overlapped) plan: on hosts with
        few cores, worker threads starve the dispatching thread (measured on
        the 2-CPU bench host: multi-thread overlap INVERTED into ~15% loss
        while single-thread streaming hides ~90ms of tokenize under device
        time) — cap workers so at least one core stays free for dispatch."""
        import os

        cpus = os.cpu_count() or 1
        return self.tokenizer_workers if cpus >= 4 else 1
    # Use the native C++ host ops (prompt packing / batch assembly) when built.
    use_native_host_ops: bool = True
    # Fuse q/k/v projections into one wide matmul at engine load. Math-identical,
    # and 2x the rate in isolation ([24576x768]x[768x2304] at 79.5 vs 41.4
    # TFLOP/s for the three [768x768] matmuls on v5e) — but measured ~4% SLOWER
    # end-to-end (65.0 vs 62.3 ms/step at B=256, S=96, INT8): XLA already
    # overlaps the three narrow matmuls, and the fused output's q/k/v slices
    # cost extra HBM copies. Kept as an opt-in for other geometries.
    fuse_qkv: bool = False

    def bucket_for_seq(self, length: int) -> int:
        for b in self.seq_buckets:
            if length <= b:
                return b
        return self.seq_buckets[-1]

    def bucket_for_labels(self, n: int) -> int:
        for b in self.label_buckets:
            if n <= b:
                return b
        return self.label_buckets[-1]


def suggest_seq_buckets(
    lengths,
    max_length: int = 512,
    budget: int = 10,
    granularity: int = 16,
) -> tuple[int, ...]:
    """Propose a seq-bucket ladder for a MEASURED prompt-length distribution.

    Encodes the r4/r5 tuning findings as a tool (the bench ladder that took
    6,703 -> 7,865 texts/s was hand-derived exactly this way): place
    fine-grained buckets (multiples of ``granularity``; 16 measured best —
    8 was worse, compile-count overhead) through the POPULATED range
    between the p5 and p95 of the distribution, then a coarse
    power-of-two-ish tail up to ``max_length`` for stragglers. ``budget``
    caps the ladder size — every bucket costs one cached XLA compile per
    (labels, rows) combination.

    Deployment recipe: tokenize a traffic sample (``PromptTokenizer
    .encode_batch(...).lengths``), pass the lengths here, set
    ``RuntimeConfig(seq_buckets=...)``. Streaming SERVING should stay on a
    coarse ladder instead — fine ladders fragment micro-batches (measured
    r4: 51 vs 279 texts/s over HTTP).
    """
    import numpy as np

    L = np.asarray(lengths)
    if L.size == 0:
        raise ValueError("lengths is empty")
    if not (L > 0).any():
        raise ValueError("lengths must contain positive values")
    L = np.minimum(L, max_length)
    g = max(8, int(granularity))

    def up(x: float) -> int:
        return int(-(-int(x) // g) * g)

    lo = max(g, up(np.quantile(L, 0.05)))
    # hi >= lo >= g guarantees the coarse-tail loop below always advances
    # (up(t * 1.5) > t for any t >= g) even for degenerate distributions
    hi = max(lo, min(max_length, up(np.quantile(L, 0.95))))
    fine = list(range(lo, hi + 1, g))
    # coarse tail: double-ish steps covering the p95..max_length stragglers
    tail = []
    t = hi
    while t < max_length:
        t = min(max_length, up(t * 1.5))
        tail.append(t)
    ladder = sorted(set(fine + tail + [max_length]))
    # trim to budget: drop the fine buckets with the FEWEST samples first
    # (each removal merges its texts into the next bucket up — least padding
    # added where the fewest texts live)
    while len(ladder) > max(2, budget):
        counts = []
        prev = 0
        for b in ladder:
            counts.append(((L > prev) & (L <= b)).sum())
            prev = b
        # never drop the last bucket (the max_length cap)
        drop = int(np.argmin(counts[:-1]))
        ladder.pop(drop)
    return tuple(ladder)


@dataclass(frozen=True)
class BackboneConfig:
    """Hyperparameters for the encoder backbone.

    ``model_type`` selects the architecture family:
      - "deberta-v2": DeBERTa-v2/v3 disentangled-attention encoders
        (knowledgator/gliclass-{small,base,large}-v1.0 backbones)
      - "llama": Llama-style decoder backbone (gliclass-llama-1.3B-v1.0)
      - "qwen2": Qwen2-style decoder backbone (gliclass-qwen-1.5B-v1.0)

    The reference engine cannot run the decoder-backbone models through its
    launcher at all (reference Readme.md:91-95); supporting them natively here is
    a capability addition.
    """

    model_type: str = "deberta-v2"
    vocab_size: int = 128100
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-7
    pad_token_id: int = 0

    # --- deberta-v2 specific ---
    relative_attention: bool = True
    position_buckets: int = 256
    max_relative_positions: int = -1
    pos_att_type: tuple[str, ...] = ("p2c", "c2p")
    share_att_key: bool = True
    norm_rel_ebd: str = "layer_norm"
    position_biased_input: bool = False
    conv_kernel_size: int = 0
    conv_act: str = "tanh"

    # --- llama/qwen2 specific ---
    num_key_value_heads: int = 0  # 0 => = num_attention_heads
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False  # qwen2 uses bias on qkv
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads


@dataclass(frozen=True)
class GLiClassConfig:
    """GLiClass model-bundle config.

    Field names follow the HF ``gliclass`` package config so that converted
    checkpoints round-trip; the exported subset mirrors what the reference ONNX
    exporter records (reference ONNX_CONVERTING/convert_to_onnx.py:19-28:
    original_model_name, architecture_type, prompt_first, original_logits).
    """

    original_model_name: str = "unknown"
    architecture_type: str = "uni-encoder"
    prompt_first: bool = True
    # Head hyperparameters (from the HF gliclass package config).
    hidden_size: int = 768  # projector width; equals backbone hidden size
    projector_hidden_act: str = "gelu"
    pooling_strategy: str = "first"  # first | mean | max | sum
    scorer_type: str = "simple"  # simple | mlp | weighted-dot
    normalize_features: bool = False
    extract_text_features: bool = False
    squeeze_layers: bool = False
    use_lstm: bool = False
    # CLIP-style init of a LEARNED ``logit_scale`` parameter (the published
    # default 2.6592 == ln(1/0.07), exactly CLIP's). This field only seeds the
    # torch reference's parameter; whether converted logits are actually
    # scaled by exp(logit_scale) is decided by EVIDENCE at conversion time —
    # the trained tensor's presence in the checkpoint state dict (a checkpoint
    # from an upstream that instantiates the parameter always contains it;
    # one that doesn't, never does). See convert/convert.py
    # load_checkpoint_state_dict and PARITY.md "logit_scale".
    logit_scale_init_value: float | None = None
    class_token_index: int = -1  # token id of <<LABEL>> (set by converter)
    text_token_index: int = -1  # token id of <<SEP>>  (set by converter)
    max_num_classes: int = 25
    backbone: BackboneConfig = field(default_factory=BackboneConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "GLiClassConfig":
        d = dict(d)
        # Published HF gliclass checkpoints (knowledgator/gliclass-*) ship a
        # composite config: model_type "GLiClass" with the full transformers
        # encoder config nested under "encoder_config" (the schema the
        # reference exporter consumes via GLiClassModel.from_pretrained,
        # reference ONNX_CONVERTING/convert_to_onnx.py:48-52). Detect that
        # schema and translate it; our own bundle configs use "backbone".
        if "backbone" not in d and (
            "encoder_config" in d or d.get("model_type") == "GLiClass"
        ):
            return _gliclass_config_from_hf_dict(d)
        bb = d.pop("backbone", {})
        if isinstance(bb, dict):
            bb = dict(bb)
            if "pos_att_type" in bb and isinstance(bb["pos_att_type"], list):
                bb["pos_att_type"] = tuple(bb["pos_att_type"])
            known = {f.name for f in dataclasses.fields(BackboneConfig)}
            bb = BackboneConfig(**{k: v for k, v in bb.items() if k in known})
        known = {f.name for f in dataclasses.fields(GLiClassConfig)}
        d = {k: v for k, v in d.items() if k in known}
        return GLiClassConfig(backbone=bb, **d)

    @staticmethod
    def from_json(s: str) -> "GLiClassConfig":
        return GLiClassConfig.from_dict(json.loads(s))


# Audit of the published HF gliclass config surface. Every field of a real
# checkpoint's config.json must be accounted for: either MAPPED into
# GLiClassConfig (it shapes the forward pass) or listed TRAINING_ONLY
# (loss hyperparameters / serialization metadata with no effect on inference).
# Anything else errors instead of silently vanishing — the reference gets this
# guarantee for free by importing the real package
# (reference ONNX_CONVERTING/convert_to_onnx.py:48-62); this repo must earn it.
_HF_MAPPED_FIELDS = frozenset({
    "architecture_type", "encoder_config", "prompt_first", "hidden_size",
    "projector_hidden_act", "pooling_strategy", "scorer_type",
    "normalize_features", "extract_text_features", "squeeze_layers",
    "use_lstm", "class_token_index", "text_token_index", "max_num_classes",
    "original_model_name", "_name_or_path", "encoder_model_name",
    "logit_scale_init_value",
})
_HF_TRAINING_ONLY_FIELDS = frozenset({
    "architectures", "model_type", "contrastive_loss_coef",
    "focal_loss_alpha", "focal_loss_gamma", "ignore_index",
    "initializer_range", "problem_type", "torch_dtype",
    "transformers_version", "vocab_size",
})


def _gliclass_config_from_hf_dict(d: dict[str, Any]) -> GLiClassConfig:
    """Published HF gliclass ``config.json`` dict -> GLiClassConfig.

    Field names follow the gliclass package's GLiClassModelConfig
    (architecture_type / prompt_first / pooling_strategy / scorer_type /
    class_token_index / text_token_index / encoder_config / ...). Every field
    must be mapped or known training-only (see :data:`_HF_MAPPED_FIELDS` /
    :data:`_HF_TRAINING_ONLY_FIELDS`); an unrecognized field raises instead of
    being dropped, so a semantic knob this engine does not implement can never
    silently produce wrong probabilities. Set GLICLASS_ALLOW_UNKNOWN_CONFIG=1
    to downgrade the error to a stderr warning (at your own risk). Mirrors the
    reference exporter's uni-encoder gate
    (reference ONNX_CONVERTING/convert_to_onnx.py:48-52)."""
    unknown = sorted(set(d) - _HF_MAPPED_FIELDS - _HF_TRAINING_ONLY_FIELDS)
    if unknown:
        import os
        import sys

        msg = (
            f"HF gliclass config has unrecognized field(s) {unknown}: each "
            "could change the forward pass in a way this engine does not "
            "implement. Map it (config.py _HF_MAPPED_FIELDS) or, if it is "
            "training-only, add it to _HF_TRAINING_ONLY_FIELDS. Set "
            "GLICLASS_ALLOW_UNKNOWN_CONFIG=1 to proceed anyway."
        )
        if os.environ.get("GLICLASS_ALLOW_UNKNOWN_CONFIG") == "1":
            print(f"warning: {msg}", file=sys.stderr)
        else:
            raise ValueError(msg)
    arch = d.get("architecture_type", "uni-encoder")
    if arch != "uni-encoder":
        raise ValueError(
            f"unsupported architecture_type: {arch!r} — only 'uni-encoder' "
            "checkpoints are supported (same gate as the reference exporter, "
            "reference ONNX_CONVERTING/convert_to_onnx.py:48-52)"
        )
    enc = d.get("encoder_config")
    if not isinstance(enc, dict):
        name = d.get("encoder_model_name")
        raise ValueError(
            "HF gliclass config has no embedded 'encoder_config' dict"
            + (f" (encoder_model_name={name!r})" if name else "")
            + "; re-save the checkpoint config with the encoder config "
            "embedded, or provide a native bundle config with 'backbone'"
        )
    # Lazy import: convert/ depends on config, so this must not be top-level.
    from .convert.hf_backbones import backbone_config_from_hf_dict

    backbone = backbone_config_from_hf_dict(enc)
    return GLiClassConfig(
        original_model_name=str(
            d.get("original_model_name") or d.get("_name_or_path") or "unknown"
        ),
        architecture_type="uni-encoder",
        # gliclass-package default is prompt_first=False (unlike our bundle
        # default True, which follows the reference CLI's sample usage).
        prompt_first=bool(d.get("prompt_first", False)),
        hidden_size=int(d.get("hidden_size") or backbone.hidden_size),
        projector_hidden_act=d.get("projector_hidden_act") or "gelu",
        pooling_strategy=d.get("pooling_strategy") or "first",
        scorer_type=d.get("scorer_type") or "simple",
        normalize_features=bool(d.get("normalize_features", False)),
        extract_text_features=bool(d.get("extract_text_features", False)),
        squeeze_layers=bool(d.get("squeeze_layers", False)),
        use_lstm=bool(d.get("use_lstm", False)),
        logit_scale_init_value=(
            float(d["logit_scale_init_value"])
            if d.get("logit_scale_init_value") is not None
            else None
        ),
        class_token_index=int(d.get("class_token_index", -1)),
        text_token_index=int(d.get("text_token_index", -1)),
        max_num_classes=int(d.get("max_num_classes", 25)),
        backbone=backbone,
    )


# Ready-made backbone configs for the published GLiClass family
# (hyperparameters of the public backbones; used by tests and the converter).
def deberta_v3_config(size: str) -> BackboneConfig:
    sizes = {
        # microsoft/deberta-v3-{small,base,large} geometry
        "small": dict(hidden_size=768, num_hidden_layers=6, num_attention_heads=12, intermediate_size=3072),
        "base": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072),
        "large": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096),
    }
    return BackboneConfig(model_type="deberta-v2", **sizes[size])


def qwen2_config(size: str = "1.5b") -> BackboneConfig:
    """Qwen2 decoder geometry (the gliclass-qwen-1.5B-v1.0 backbone — a
    checkpoint the reference's launcher cannot load at all, reference
    Readme.md:91-95)."""
    sizes = {
        # Qwen/Qwen2-1.5B geometry
        "1.5b": dict(
            hidden_size=1536, num_hidden_layers=28, num_attention_heads=12,
            num_key_value_heads=2, intermediate_size=8960, vocab_size=151936,
            max_position_embeddings=32768, rope_theta=1_000_000.0,
            hidden_act="silu", rms_norm_eps=1e-6,
        ),
    }
    return BackboneConfig(model_type="qwen2", relative_attention=False,
                          **sizes[size])


def llama_config(size: str = "1.3b") -> BackboneConfig:
    """Llama decoder geometry (the gliclass-llama-1.3B-v1.0 backbone =
    Sheared-LLaMA-1.3B; the other decoder checkpoint the reference's
    launcher cannot load, reference Readme.md:91-95)."""
    sizes = {
        # princeton-nlp/Sheared-LLaMA-1.3B geometry
        "1.3b": dict(
            hidden_size=2048, num_hidden_layers=24, num_attention_heads=16,
            num_key_value_heads=16, intermediate_size=5504, vocab_size=32000,
            max_position_embeddings=4096, rope_theta=10000.0,
            hidden_act="silu", rms_norm_eps=1e-5,
        ),
    }
    return BackboneConfig(model_type="llama", relative_attention=False,
                          **sizes[size])
