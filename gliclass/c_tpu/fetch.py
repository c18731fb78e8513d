"""Model artifact fetch + cache (the run_GLiClass.sh replacement).

The reference launcher downloads onnx/config.json, onnx/model.onnx and
tokenizer/tokenizer.json from the HuggingFace hub with re-download logic keyed
on original_model_name (reference run_GLiClass.sh:33-83). Here the same flow
fetches the HF *checkpoint* (config + safetensors + tokenizer), converts it to
a native weight bundle on first use, and caches both; cache integrity is keyed
on the model name recorded inside the bundle config, exactly like the
reference's check (reference run_GLiClass.sh:62-69).

Network access happens only inside this module and only on cache miss.
"""

from __future__ import annotations

import json
import os
import sys

DEFAULT_CACHE = os.path.expanduser("~/.cache/gliclass_tpu")


def bundle_cache_path(model_name: str, cache_dir: str | None = None) -> str:
    safe = model_name.replace("/", "--")
    return os.path.join(cache_dir or DEFAULT_CACHE, "bundles", safe)


def _bundle_is_valid(bundle_path: str, model_name: str) -> bool:
    """Cache check mirroring run_GLiClass.sh:57-83: all files present and the
    recorded original_model_name matches."""
    cfg_path = os.path.join(bundle_path, "config.json")
    if not os.path.exists(cfg_path):
        return False
    for f in ("weights.safetensors", "tokenizer.json"):
        if not os.path.exists(os.path.join(bundle_path, f)):
            return False
    try:
        with open(cfg_path) as fh:
            recorded = json.load(fh).get("original_model_name")
    except (OSError, json.JSONDecodeError):
        return False
    return recorded == model_name


def fetch_checkpoint(model_name: str, cache_dir: str | None = None) -> str:
    """Download the HF checkpoint files; returns the local snapshot dir."""
    from huggingface_hub import snapshot_download

    return snapshot_download(
        model_name,
        cache_dir=os.path.join(cache_dir or DEFAULT_CACHE, "hub"),
        allow_patterns=["*.json", "*.safetensors", "*.bin", "tokenizer*"],
    )


def ensure_bundle(
    model_name: str,
    cache_dir: str | None = None,
    quantize: bool = True,
    force: bool = False,
) -> str:
    """Return a ready-to-serve bundle path for an HF model name, fetching and
    converting on first use (or when the cache fails its integrity check)."""
    bundle_path = bundle_cache_path(model_name, cache_dir)
    if not force and _bundle_is_valid(bundle_path, model_name):
        return bundle_path

    print(f"fetching {model_name} ...", file=sys.stderr)
    ckpt_dir = fetch_checkpoint(model_name, cache_dir)
    convert_checkpoint_dir(ckpt_dir, bundle_path, model_name, quantize=quantize)
    return bundle_path


def convert_checkpoint_dir(
    ckpt_dir: str, bundle_path: str, model_name: str, quantize: bool = True
) -> None:
    """Local HF gliclass checkpoint dir -> native bundle (shared by `fetch`
    and `convert` CLI commands)."""
    import dataclasses

    from .config import GLiClassConfig
    from .convert.convert import export_bundle, load_checkpoint_state_dict
    from .convert.torch_ref import build_torch_gliclass
    from .tokenization import PromptTokenizer

    with open(os.path.join(ckpt_dir, "config.json")) as f:
        cfg = GLiClassConfig.from_dict(json.load(f))
    cfg = dataclasses.replace(cfg, original_model_name=model_name)

    tok = PromptTokenizer.from_file(os.path.join(ckpt_dir, "tokenizer.json"))
    if cfg.class_token_index < 0:
        if tok.label_token_id is None or tok.sep_token_id is None:
            raise ValueError(
                "config has no class/text_token_index and the tokenizer does "
                "not define <<LABEL>>/<<SEP>> — not a GLiClass checkpoint?"
            )
        cfg = dataclasses.replace(
            cfg,
            class_token_index=tok.label_token_id,
            text_token_index=tok.sep_token_id,
        )
    elif tok.label_token_id is not None and tok.label_token_id != cfg.class_token_index:
        raise ValueError(
            f"tokenizer <<LABEL>> id {tok.label_token_id} != config "
            f"class_token_index {cfg.class_token_index}: tokenizer.json does "
            "not belong to this checkpoint"
        )

    model = build_torch_gliclass(cfg)
    st = os.path.join(ckpt_dir, "model.safetensors")
    pt = os.path.join(ckpt_dir, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.torch import load_file

        sd = load_file(st)
    elif os.path.exists(pt):
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights file in {ckpt_dir}")
    # Strict, prefix-aware loading: errors on zero-matched or mismatched keys
    # instead of silently baking random-init goldens into the bundle.
    load_checkpoint_state_dict(model, sd)
    export_bundle(model, cfg, tok, bundle_path, quantize=quantize)
