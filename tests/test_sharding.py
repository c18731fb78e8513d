"""Sharding correctness on the 8-virtual-device CPU mesh: logits must be
invariant to mesh shape (1x1 / dp / tp / dp x tp), per SURVEY §7 step 5
("verify logits invariant to mesh shape")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
from gliclass.c_tpu.engine import InferenceEngine
from gliclass.c_tpu.models.gliclass import init_gliclass_params
from gliclass.c_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from gliclass.c_tpu.parallel.sharding import param_pspecs, shard_params
from gliclass.c_tpu.prompting import pack_prompts
from gliclass.c_tpu.tokenization import PromptTokenizer


def tiny_cfg(tok, model_type="deberta-v2"):
    if model_type == "deberta-v2":
        bb = BackboneConfig(
            model_type="deberta-v2", vocab_size=600, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=8, intermediate_size=128,
            max_position_embeddings=64, position_buckets=16,
            norm_rel_ebd="layer_norm", share_att_key=True,
            position_biased_input=False,
        )
    else:
        bb = BackboneConfig(
            model_type="llama", vocab_size=600, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
            intermediate_size=128, max_position_embeddings=64,
        )
    return GLiClassConfig(
        hidden_size=64, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )


def make_batch(tok, n_texts=8):
    texts = [f"the quick brown fox number {i}" for i in range(n_texts)]
    labels = [["science", "sports", "format", "question"]]
    prompts = pack_prompts(texts, labels, True, True)
    return tok.encode_batch(prompts, max_length=64, pad_to=32)


def test_pspec_shapes():
    cfg = GLiClassConfig(hidden_size=64, backbone=BackboneConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=128, max_position_embeddings=32,
        position_buckets=8))
    params = init_gliclass_params(jax.random.key(0), cfg)
    specs = param_pspecs(params)
    assert specs["backbone"]["layers"]["attn"]["q"]["w"] == P(None, None, MODEL_AXIS)
    assert specs["backbone"]["layers"]["attn"]["o"]["w"] == P(None, MODEL_AXIS, None)
    assert specs["backbone"]["layers"]["ffn"]["up"]["b"] == P(None, MODEL_AXIS)
    assert specs["backbone"]["layers"]["ffn"]["down"]["b"] == P()
    assert specs["backbone"]["embeddings"]["word"] == P()
    assert specs["head"]["text_projector"]["linear_1"]["w"] == P(None, MODEL_AXIS)
    assert specs["head"]["text_projector"]["linear_2"]["w"] == P(MODEL_AXIS, None)


@pytest.mark.parametrize("model_type", ["deberta-v2", "llama"])
@pytest.mark.parametrize("dp,tp", [(1, 1), (4, 1), (1, 8), (2, 4)])
def test_mesh_invariance(tiny_tokenizer_file, model_type, dp, tp):
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok, model_type)
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch = make_batch(tok)

    ref_engine = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32", dp_size=1, tp_size=1)
    )
    ref = ref_engine.run(batch, max_labels=4)

    engine = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32", dp_size=dp, tp_size=tp)
    )
    out = engine.run(batch, max_labels=4)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("model_type", ["deberta-v2", "llama"])
@pytest.mark.parametrize("dp,sp,tp", [(1, 8, 1), (1, 2, 4), (2, 2, 2)])
def test_seq_parallel_invariance(tiny_tokenizer_file, model_type, dp, sp, tp):
    """Sequence parallelism: probs invariant when the token axis is sharded.

    make_batch pads to S=32, divisible by every sp here; XLA inserts the k/v
    all-gathers for attention across the seq axis."""
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok, model_type)
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch = make_batch(tok)

    ref = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32")
    ).run(batch, max_labels=4)
    engine = InferenceEngine(
        cfg,
        params,
        RuntimeConfig(compute_dtype="float32", dp_size=dp, tp_size=tp, sp_size=sp),
    )
    out = engine.run(batch, max_labels=4)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_seq_parallel_indivisible_bucket_falls_back(tiny_tokenizer_file):
    """A seq length that does not divide sp runs seq-replicated (no crash)."""
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    texts = [f"odd length text {i}" for i in range(4)]
    prompts = pack_prompts(texts, [["a", "b"]], True, True)
    batch = tok.encode_batch(prompts, max_length=64, pad_to=27)  # 27 % 8 != 0

    engine = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32", sp_size=8)
    )
    out = engine.run(batch, max_labels=4)
    ref = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32")
    ).run(batch, max_labels=4)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_mesh_invariance_int8(tiny_tokenizer_file):
    from gliclass.c_tpu.ops.quant import quantize_tree

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    qparams = quantize_tree(jax.tree.map(np.asarray, params))
    batch = make_batch(tok)

    ref = InferenceEngine(
        cfg, qparams, RuntimeConfig(compute_dtype="float32")
    ).run(batch, max_labels=4)
    out = InferenceEngine(
        cfg, qparams, RuntimeConfig(compute_dtype="float32", dp_size=2, tp_size=4)
    ).run(batch, max_labels=4)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_ragged_batch_padding(tiny_tokenizer_file):
    """Batch sizes that don't divide dp are padded and sliced back."""
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch5 = make_batch(tok, n_texts=5)
    engine = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32", dp_size=4, tp_size=2)
    )
    out = engine.run(batch5, max_labels=4)
    assert out.shape == (5, 4)
    ref = InferenceEngine(
        cfg, params, RuntimeConfig(compute_dtype="float32")
    ).run(batch5, max_labels=4)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_sharded_params_actually_sharded(tiny_tokenizer_file):
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    mesh = make_mesh(1, 8)
    sharded = shard_params(params, mesh)
    qw = sharded["backbone"]["layers"]["attn"]["q"]["w"]
    # each device holds 1/8 of the output dim
    shard_shape = qw.sharding.shard_shape(qw.shape)
    assert shard_shape[-1] == qw.shape[-1] // 8
