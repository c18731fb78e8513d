"""Parity of the JAX Llama/Qwen2 decoder backbone vs transformers PyTorch.

These backbones serve gliclass-llama-1.3B-v1.0 / gliclass-qwen-1.5B-v1.0 — the
checkpoints the reference engine cannot launch (reference Readme.md:91-95).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.config import BackboneConfig
from gliclass.c_tpu.convert.hf_backbones import (
    convert_llama_state_dict,
    llama_config_from_hf,
)
from gliclass.c_tpu.models.llama import llama_encode


def make_torch(model_type: str, **over):
    import torch

    torch.manual_seed(0)
    kw = dict(
        vocab_size=130,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        attention_dropout=0.0,
    )
    kw.update(over)
    if model_type == "llama":
        from transformers import LlamaConfig, LlamaModel

        cfg = LlamaConfig(**kw)
        return LlamaModel(cfg).eval(), cfg
    else:
        from transformers import Qwen2Config, Qwen2Model

        cfg = Qwen2Config(**kw)
        return Qwen2Model(cfg).eval(), cfg


@pytest.mark.parametrize("model_type", ["llama", "qwen2"])
def test_decoder_backbone_parity(model_type):
    import torch

    model, hf_cfg = make_torch(model_type)
    cfg = llama_config_from_hf(hf_cfg, model_type)

    rng = np.random.default_rng(3)
    ids = rng.integers(1, 130, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), dtype=np.int32)
    mask[1, 9:] = 0
    ids[1, 9:] = 0

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    params = jax.tree.map(
        jnp.asarray, convert_llama_state_dict(model.state_dict(), cfg)
    )
    out = np.asarray(
        llama_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-4, rtol=1e-4)


def test_mqa_and_no_gqa_variants():
    import torch

    # MHA (kv == heads) and MQA (kv == 1)
    for kv in (4, 1):
        model, hf_cfg = make_torch("llama", num_key_value_heads=kv)
        cfg = llama_config_from_hf(hf_cfg, "llama")
        ids = np.ones((1, 8), dtype=np.int32) * 5
        mask = np.ones((1, 8), dtype=np.int32)
        with torch.no_grad():
            ref = model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        params = jax.tree.map(
            jnp.asarray, convert_llama_state_dict(model.state_dict(), cfg)
        )
        out = np.asarray(llama_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
        np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "head_over",
    [
        {},
        # decoder-backbone hidden-states order differs (post-final-norm last):
        # exercise the LayersFuser + BiLSTM over it.
        {"use_lstm": True, "squeeze_layers": True},
    ],
)
def test_gliclass_with_llama_backbone(tiny_tokenizer_file, head_over):
    """Full GLiClass model over a decoder backbone: torch ref vs JAX."""
    import torch

    from gliclass.c_tpu.config import GLiClassConfig
    from gliclass.c_tpu.convert.convert import convert_gliclass_state_dict
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass
    from gliclass.c_tpu.models.gliclass import gliclass_forward
    from gliclass.c_tpu.prompting import pack_prompts
    from gliclass.c_tpu.tokenization import PromptTokenizer

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="qwen2",
        vocab_size=600,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        attention_bias=True,
    )
    cfg = GLiClassConfig(
        hidden_size=32,
        class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id,
        prompt_first=False,  # decoder models put the prompt last
        backbone=bb,
        **head_over,
    )
    model = build_torch_gliclass(cfg)
    prompts = pack_prompts(
        ["why are you running", "the quick brown fox"],
        [["question", "statement", "animal"]],
        True,
        cfg.prompt_first,
    )
    batch = tok.encode_batch(prompts, max_length=64)
    with torch.no_grad():
        ref, ref_mask = model(
            torch.tensor(batch.input_ids.astype(np.int64)),
            torch.tensor(batch.attention_mask.astype(np.int64)),
            max_labels=4,
        )
    params = jax.tree.map(
        jnp.asarray, convert_gliclass_state_dict(model.state_dict(), cfg)
    )
    out = np.asarray(
        gliclass_forward(
            params,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.attention_mask),
            cfg,
            max_labels=4,
        )
    )
    m = ref_mask.numpy()
    np.testing.assert_allclose(out[m], ref.numpy()[m], atol=3e-4, rtol=1e-4)
