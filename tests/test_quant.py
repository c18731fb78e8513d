"""INT8 quantization coverage tests.

These guard the failure mode the round-1 build shipped: ``quantize_tree`` only
handled 2-D kernels, so the scan-stacked ``[L, K, N]`` encoder weights silently
stayed full precision and every "INT8" bundle/bench ran a bf16 backbone. The
reference quantizes EVERY MatMul weight in the graph (reference
ONNX_CONVERTING/convert_to_onnx.py:81-89); these tests assert the same coverage
on the param tree and that the INT8 path measurably executes (logits differ
from fp32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig
from gliclass.c_tpu.convert.bundle import flatten_tree
from gliclass.c_tpu.models.gliclass import gliclass_forward, init_gliclass_params
from gliclass.c_tpu.ops.quant import (
    dequantize_weight,
    quantize_tree,
    quantize_weight,
)
from gliclass.c_tpu.prompting import pack_prompts
from gliclass.c_tpu.tokenization import PromptTokenizer


def _tiny_cfg(tok, **bb_over):
    bb = dict(
        model_type="deberta-v2",
        vocab_size=600,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        position_buckets=16,
        norm_rel_ebd="layer_norm",
        share_att_key=True,
        position_biased_input=False,
    )
    bb.update(bb_over)
    return GLiClassConfig(
        hidden_size=32,
        class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id,
        prompt_first=True,
        backbone=BackboneConfig(**bb),
    )


def test_quantize_weight_stacked_matches_per_layer(rng):
    """3-D [L, K, N] quantization == independent 2-D quantization per layer,
    so a lax.scan slice of (w_q, scale) is exactly that layer's 2-D quant."""
    w = rng.standard_normal((3, 16, 24)).astype(np.float32)
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == np.int8 and w_q.shape == (3, 16, 24)
    assert scale.shape == (3, 24)
    for l in range(3):
        wq_l, sc_l = quantize_weight(w[l])
        np.testing.assert_array_equal(w_q[l], wq_l)
        np.testing.assert_array_equal(scale[l], sc_l)
    # round-trip error bounded by scale/2 per element
    deq = dequantize_weight(w_q, scale)
    assert np.max(np.abs(deq - w)) <= 0.5 * scale.max() + 1e-7


def test_quantize_weight_zero_columns(rng):
    w = np.zeros((2, 8, 8), np.float32)
    w_q, scale = quantize_weight(w)
    np.testing.assert_array_equal(w_q, 0)
    np.testing.assert_array_equal(scale, 1.0)


@pytest.mark.parametrize("model_type", ["deberta-v2", "llama"])
def test_quantize_tree_covers_every_backbone_matmul(tiny_tokenizer_file, model_type):
    """Every matmul kernel in the tree — stacked encoder layers AND head
    projectors — must come out as int8 ``w_q`` with matching scales. No dense
    ``w`` may survive outside the documented skips (embeddings, conv stem)."""
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    over = {} if model_type == "deberta-v2" else dict(
        model_type="llama", num_key_value_heads=2, position_buckets=-1,
        norm_rel_ebd="none", relative_attention=False,
    )
    cfg = _tiny_cfg(tok, **over)
    params = jax.tree.map(np.asarray, init_gliclass_params(jax.random.key(0), cfg))
    q = quantize_tree(params)

    flat = flatten_tree(q)
    # 1) the stacked encoder kernels are all quantized
    if model_type == "deberta-v2":
        stacked = ["attn/q", "attn/k", "attn/v", "attn/o", "ffn/up", "ffn/down"]
    else:
        stacked = ["attn/q", "attn/k", "attn/v", "attn/o",
                   "mlp/gate", "mlp/up", "mlp/down"]
    L = cfg.backbone.num_hidden_layers
    for name in stacked:
        wq = flat[f"backbone/layers/{name}/w_q"]
        sc = flat[f"backbone/layers/{name}/scale"]
        assert wq.dtype == np.int8, name
        assert wq.ndim == 3 and wq.shape[0] == L, (name, wq.shape)
        assert sc.shape == (L, wq.shape[-1]), name
        assert f"backbone/layers/{name}/w" not in flat, name
    # 2) the head projectors are quantized
    for name in ("head/text_projector/linear_1", "head/text_projector/linear_2",
                 "head/classes_projector/linear_1", "head/classes_projector/linear_2"):
        assert flat[f"{name}/w_q"].dtype == np.int8, name
    # 3) NOTHING else keeps a dense fp kernel except the documented skips
    leftovers = [k for k in flat if k.endswith("/w")]
    assert all("embeddings" in k or "conv" in k for k in leftovers), leftovers
    # 4) embeddings stay full precision
    assert flat["backbone/embeddings/word"].dtype == np.float32


def test_int8_backbone_actually_executes(tiny_tokenizer_file):
    """Guard against the silent-no-op failure mode: INT8 logits must DIFFER
    measurably from fp32 (the backbone really ran quantized) while staying
    within the loose closeness budget."""
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = _tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    prompts = pack_prompts(
        ["the quick brown fox", "onnx is an open-source format"],
        [["science", "sports", "format"]], True, cfg.prompt_first,
    )
    b = tok.encode_batch(prompts, max_length=64)
    ids, mask = jnp.asarray(b.input_ids), jnp.asarray(b.attention_mask)

    full = np.asarray(gliclass_forward(params, ids, mask, cfg, max_labels=3))
    q = jax.tree.map(jnp.asarray, quantize_tree(jax.tree.map(np.asarray, params)))
    quant = np.asarray(gliclass_forward(q, ids, mask, cfg, max_labels=3))
    assert np.isfinite(quant).all()
    diff = np.abs(quant - full).max()
    assert diff > 1e-6, "INT8 logits identical to fp32 — quantization was a no-op"
    np.testing.assert_allclose(quant, full, atol=0.2)


def test_quantized_tree_scan_slices_work_with_linear(rng):
    """A scan slice of stacked (w_q, scale) through ops.linear equals the
    dequantized matmul computed by hand."""
    from gliclass.c_tpu.ops.layers import linear

    w = rng.standard_normal((2, 16, 8)).astype(np.float32)
    b = rng.standard_normal((2, 8)).astype(np.float32)
    w_q, scale = quantize_weight(w)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    for l in range(2):
        p = {"w_q": jnp.asarray(w_q[l]), "scale": jnp.asarray(scale[l]),
             "b": jnp.asarray(b[l])}
        got = np.asarray(linear(p, jnp.asarray(x)))
        want = x @ dequantize_weight(w_q[l], scale[l]) + b[l]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_w8a8_linear_math(rng):
    """w8a8 (act_quant context): int8x int8 dot + two-scale epilogue equals
    the quantize-by-hand reference; bf16-only (fp32 parity mode must keep
    weight-only regardless of the context)."""
    from gliclass.c_tpu.ops.layers import act_quant, linear

    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.1
    w_q, scale = quantize_weight(w)
    x = rng.standard_normal((6, 32)).astype(np.float32)
    p = {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale)}

    with act_quant(True):
        got = np.asarray(
            linear(p, jnp.asarray(x, jnp.bfloat16), jnp.bfloat16),
            dtype=np.float32,
        )
    s_x = np.maximum(np.abs(x).max(axis=-1, keepdims=True) / 127.0, 1e-10)
    x_q = np.round(x / s_x).astype(np.int8)
    want = (x_q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32)
    want = want * s_x * scale
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-2, atol=2e-2)

    # fp32 parity mode ignores the context (weight-only dequant)
    with act_quant(True):
        got32 = np.asarray(linear(p, jnp.asarray(x), jnp.float32))
    want32 = x @ dequantize_weight(w_q, scale)
    np.testing.assert_allclose(got32, want32, rtol=1e-5, atol=1e-5)


def test_w8a8_engine_close_to_fp32_and_not_a_noop(tiny_tokenizer_file):
    """quant_mode="int8-dynamic" end-to-end: probabilities stay close to the
    weight-only INT8 path (activation quant adds bounded noise) and MUST
    differ from it (the activation quantization really executed)."""
    from gliclass.c_tpu.config import RuntimeConfig
    from gliclass.c_tpu.engine import InferenceEngine
    from gliclass.c_tpu.ops.quant import quantize_tree
    from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = _tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    q = quantize_tree(jax.tree.map(np.asarray, params))

    texts = ["the quick brown fox", "onnx is an open-source format", "fast ai"]
    labels = [["science", "sports", "format"]]

    def probs(quant_mode):
        rt = RuntimeConfig(
            batch_size=4, max_length=64, compute_dtype="bfloat16",
            quant_mode=quant_mode, seq_buckets=(64,), label_buckets=(4,),
        )
        pipe = ZeroShotClassificationPipeline(
            InferenceEngine(cfg, q, rt), tok, rt
        )
        return pipe.predict_probs(texts, labels, True)

    p_w8 = probs("int8")
    p_w8a8 = probs("int8-dynamic")
    assert np.isfinite(p_w8a8).all()
    diff = np.abs(p_w8a8 - p_w8).max()
    assert diff > 1e-7, "int8-dynamic identical to weight-only — act quant no-op"
    np.testing.assert_allclose(p_w8a8, p_w8, atol=0.05)


def test_w8a8_stacked_launch_matches_singles(tiny_tokenizer_file):
    """The stacked executable (lax.scan over batches) traces inside the same
    act_quant context as single steps: stacked w8a8 probs == per-batch w8a8
    probs exactly (same executED math, same inputs)."""
    from gliclass.c_tpu.config import RuntimeConfig
    from gliclass.c_tpu.engine import InferenceEngine
    from gliclass.c_tpu.ops.quant import quantize_tree
    from gliclass.c_tpu.parallel.scheduler import plan_batches, run_planned
    from gliclass.c_tpu.prompting import pack_prompts as _pp

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = _tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    q = quantize_tree(jax.tree.map(np.asarray, params))
    rt = RuntimeConfig(
        batch_size=2, max_length=64, compute_dtype="bfloat16",
        quant_mode="int8-dynamic", seq_buckets=(64,), label_buckets=(4,),
    )
    engine = InferenceEngine(cfg, q, rt)
    texts = [f"sample text number {i} about science" for i in range(6)]
    labels = [["science", "sports", "format"]]
    prompts = pack_prompts(texts, labels, True, cfg.prompt_first)
    planned = plan_batches(tok, prompts, [3] * 6, rt)
    assert len(planned) == 3  # 3 same-shape batches -> one stacked launch
    stacked = run_planned(engine, planned, 6, 3)
    singles = np.concatenate(
        [engine.run(pb.batch, pb.max_labels) for pb in planned]
    )
    order = np.concatenate([pb.indices for pb in planned])
    np.testing.assert_allclose(
        stacked[order], singles[:, :3], rtol=1e-5, atol=1e-5
    )
