"""Weight-bundle on-disk format: the engine's model artifact.

Replaces the reference's artifact triple (onnx/model.onnx + onnx/config.json +
tokenizer/tokenizer.json; reference run_GLiClass.sh:33-45, include/paths.h:4-5)
with a directory:

    bundle/
      config.json            GLiClassConfig (+ original_model_name etc.)
      goldens.json           golden-logit records (fp32 torch reference)
      weights.safetensors    fp32/bf16 params, keys are /-joined tree paths
      weights_int8.safetensors  optional INT8 weights + scales (quant bundle)
      tokenizer.json         HF tokenizers file

The golden-logit records play the exact role of "original_logits" in the
reference's exported config (reference ONNX_CONVERTING/convert_to_onnx.py:19-28)
and are asserted by the engine's regression tests
(reference ONNX_CONVERTING/test_onnx.py:25-31 pattern).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from ..config import GLiClassConfig

Params = dict[str, Any]


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> Params:
    root: Params = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


def save_bundle(
    path: str,
    cfg: GLiClassConfig,
    params: Params,
    tokenizer_json: str | None = None,
    goldens: list[dict] | None = None,
    int8_params: Params | None = None,
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())
    flat = {k: np.ascontiguousarray(v) for k, v in flatten_tree(params).items()}
    save_file(flat, os.path.join(path, "weights.safetensors"))
    if int8_params is not None:
        flat8 = {
            k: np.ascontiguousarray(v) for k, v in flatten_tree(int8_params).items()
        }
        save_file(flat8, os.path.join(path, "weights_int8.safetensors"))
    if tokenizer_json is not None:
        with open(os.path.join(path, "tokenizer.json"), "w") as f:
            f.write(tokenizer_json)
    if goldens is not None:
        with open(os.path.join(path, "goldens.json"), "w") as f:
            json.dump(goldens, f)


def load_config(path: str) -> GLiClassConfig:
    with open(os.path.join(path, "config.json")) as f:
        return GLiClassConfig.from_json(f.read())


def load_params(path: str, quantized: bool = False) -> Params:
    from safetensors.numpy import load_file

    name = "weights_int8.safetensors" if quantized else "weights.safetensors"
    fp = os.path.join(path, name)
    if not os.path.exists(fp):
        raise FileNotFoundError(
            f"{fp} not found"
            + (" — run the converter with --quantize first" if quantized else "")
        )
    return unflatten_tree(load_file(fp))


def load_goldens(path: str) -> list[dict]:
    fp = os.path.join(path, "goldens.json")
    if not os.path.exists(fp):
        return []
    with open(fp) as f:
        return json.load(f)


def tokenizer_path(path: str) -> str:
    return os.path.join(path, "tokenizer.json")
