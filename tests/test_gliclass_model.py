"""End-to-end model parity: torch reference GLiClass (transformers backbone +
head) vs the JAX engine, through real prompt packing + tokenization.

This reproduces the reference's golden-logit QA design (SURVEY §4): fp32 logits
from the torch implementation are the goldens; the JAX fp32 path must match
within atol 1e-3 (the reference's own gate, test_onnx.py:30,74) — we assert a
tighter 2e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig
from gliclass.c_tpu.models.gliclass import (
    gliclass_forward,
    gliclass_probs,
    init_gliclass_params,
)
from gliclass.c_tpu.models.heads import extract_label_embeddings, pool_text
from gliclass.c_tpu.prompting import pack_prompts
from gliclass.c_tpu.tokenization import PromptTokenizer


def tiny_cfg(tok, **head_over):
    bb = BackboneConfig(
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
    kw = dict(
        hidden_size=32,
        class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id,
        prompt_first=True,
        backbone=bb,
    )
    kw.update(head_over)
    return GLiClassConfig(**kw)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "onnx is an open-source format for ai models",
    "why are you running",
]
LABELS = [["science", "sports", "format", "question"]]


def _encode(tok, cfg, texts, labels, same_labels, pad_to=None):
    prompts = pack_prompts(texts, labels, same_labels, cfg.prompt_first)
    return tok.encode_batch(prompts, max_length=64, pad_to=pad_to)


def _torch_logits(model, batch, max_labels):
    import torch

    with torch.no_grad():
        logits, mask = model(
            torch.tensor(batch.input_ids.astype(np.int64)),
            torch.tensor(batch.attention_mask.astype(np.int64)),
            max_labels=max_labels,
        )
    return logits.numpy(), mask.numpy()


@pytest.mark.parametrize(
    "head_over",
    [
        {},  # simple scorer, first pooling (v1.0 checkpoints)
        {"pooling_strategy": "mean"},
        {"pooling_strategy": "max"},
        {"scorer_type": "mlp"},
        {"scorer_type": "weighted-dot"},
        {"normalize_features": True},
        {"prompt_first": False},
        {"use_lstm": True},  # BiLSTM vs torch nn.LSTM + pack_padded
        {"squeeze_layers": True},  # LayersFuser vs torch output_hidden_states mix
        {"use_lstm": True, "squeeze_layers": True, "scorer_type": "weighted-dot"},
        # extract_text_features: pool the text span only (both prompt layouts,
        # span-first and span-mean pooling)
        {"extract_text_features": True},
        {"extract_text_features": True, "pooling_strategy": "mean"},
        {"extract_text_features": True, "prompt_first": False},
        {"extract_text_features": True, "prompt_first": False,
         "pooling_strategy": "max"},
    ],
)
def test_full_model_parity(tiny_tokenizer_file, head_over):
    from gliclass.c_tpu.convert.convert import convert_gliclass_state_dict
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok, **head_over)
    model = build_torch_gliclass(cfg)

    batch = _encode(tok, cfg, TEXTS, LABELS, True)
    ref, ref_mask = _torch_logits(model, batch, max_labels=4)

    params = jax.tree.map(jnp.asarray, convert_gliclass_state_dict(model.state_dict(), cfg))
    out = np.asarray(
        gliclass_forward(
            params,
            jnp.asarray(batch.input_ids),
            jnp.asarray(batch.attention_mask),
            cfg,
            max_labels=4,
        )
    )
    np.testing.assert_allclose(out[ref_mask], ref[ref_mask], atol=2e-4, rtol=1e-4)


def test_label_bucket_padding_invariance(tiny_tokenizer_file):
    """Extra label slots and extra sequence padding must not change real logits
    (the engine's bucketing contract)."""
    from gliclass.c_tpu.convert.convert import convert_gliclass_state_dict
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    model = build_torch_gliclass(cfg)
    params = jax.tree.map(jnp.asarray, convert_gliclass_state_dict(model.state_dict(), cfg))

    tight = _encode(tok, cfg, TEXTS, LABELS, True)
    padded = _encode(tok, cfg, TEXTS, LABELS, True, pad_to=48)

    out_tight = np.asarray(
        gliclass_forward(params, jnp.asarray(tight.input_ids),
                         jnp.asarray(tight.attention_mask), cfg, max_labels=4)
    )
    out_padded = np.asarray(
        gliclass_forward(params, jnp.asarray(padded.input_ids),
                         jnp.asarray(padded.attention_mask), cfg, max_labels=8)
    )
    np.testing.assert_allclose(out_padded[:, :4], out_tight, atol=2e-5, rtol=1e-5)
    # padded slots are hard-masked to huge negative logits -> sigmoid 0
    probs = 1 / (1 + np.exp(-out_padded[:, 4:]))
    assert (probs == 0.0).all()


def test_per_text_labels_and_probs(tiny_tokenizer_file):
    from gliclass.c_tpu.convert.convert import convert_gliclass_state_dict
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    model = build_torch_gliclass(cfg)
    params = jax.tree.map(jnp.asarray, convert_gliclass_state_dict(model.state_dict(), cfg))

    labels = [["science", "sports"], ["format", "model", "tool"], ["question"]]
    batch = _encode(tok, cfg, TEXTS, labels, False)
    probs = np.asarray(
        gliclass_probs(params, jnp.asarray(batch.input_ids),
                       jnp.asarray(batch.attention_mask), cfg, max_labels=4)
    )
    assert probs.shape == (3, 4)
    # slots beyond each text's label count give probability exactly 0
    assert probs[0, 2:].max() == 0.0
    assert probs[1, 3:].max() == 0.0
    assert probs[2, 1:].max() == 0.0
    ref, ref_mask = _torch_logits(model, batch, max_labels=4)
    ref_probs = 1 / (1 + np.exp(-ref))
    np.testing.assert_allclose(probs[ref_mask], ref_probs[ref_mask], atol=2e-4)


def test_extract_label_embeddings_unit():
    ids = jnp.asarray([[7, 5, 1, 5, 2, 0], [5, 1, 0, 0, 0, 0]])
    hidden = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    emb, mask = extract_label_embeddings(hidden, ids, class_token_id=5, max_labels=3)
    np.testing.assert_array_equal(np.asarray(mask), [[True, True, False], [True, False, False]])
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(hidden[0, 1]))
    np.testing.assert_allclose(np.asarray(emb[0, 1]), np.asarray(hidden[0, 3]))
    np.testing.assert_allclose(np.asarray(emb[1, 0]), np.asarray(hidden[1, 0]))
    np.testing.assert_allclose(np.asarray(emb[0, 2]), np.zeros(3))


def test_pooling_unit():
    hidden = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    mask = jnp.asarray([[1, 1, 0]])
    np.testing.assert_allclose(np.asarray(pool_text(hidden, mask, "first")), [[1.0, 2.0]])
    np.testing.assert_allclose(np.asarray(pool_text(hidden, mask, "mean")), [[2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(pool_text(hidden, mask, "max")), [[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(pool_text(hidden, mask, "sum")), [[4.0, 6.0]])


def test_text_span_mask_unit():
    """extract_text_features span selection, both prompt layouts.

    Token ids: 5 = <<LABEL>>, 9 = <<SEP>>, 0 = pad; others are content.
    """
    from gliclass.c_tpu.models.heads import text_span_mask

    # prompt_first: [CLS=1, <<L>>, lab, <<L>>, lab, <<SEP>>, txt, txt, EOS=2, pad]
    ids_pf = jnp.asarray([[1, 5, 3, 5, 4, 9, 6, 7, 2, 0]])
    m_pf = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 1, 1, 0]])
    span = np.asarray(text_span_mask(ids_pf, m_pf, 5, 9, prompt_first=True))
    np.testing.assert_array_equal(
        span, [[0, 0, 0, 0, 0, 0, 1, 1, 1, 0]]
    )
    # text-first: [CLS=1, txt, txt, <<L>>, lab, <<SEP>>, EOS=2, pad, pad, pad]
    ids_tf = jnp.asarray([[1, 6, 7, 5, 4, 9, 2, 0, 0, 0]])
    m_tf = jnp.asarray([[1, 1, 1, 1, 1, 1, 1, 0, 0, 0]])
    span = np.asarray(text_span_mask(ids_tf, m_tf, 5, 9, prompt_first=False))
    np.testing.assert_array_equal(
        span, [[1, 1, 1, 0, 0, 0, 0, 0, 0, 0]]
    )
    # empty text span falls back to all valid tokens (never an all-False mask)
    ids_empty = jnp.asarray([[1, 5, 3, 9, 2, 0]])
    m_empty = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    span = np.asarray(text_span_mask(ids_empty, m_empty, 5, 9, prompt_first=True))
    np.testing.assert_array_equal(span, [[1, 1, 1, 1, 0, 0]])


def test_bundle_roundtrip(tiny_tokenizer_file, tmp_path):
    from gliclass.c_tpu.convert import bundle
    from gliclass.c_tpu.convert.convert import export_bundle
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    model = build_torch_gliclass(cfg)
    out = str(tmp_path / "bundle")
    params = export_bundle(model, cfg, tok, out, quantize=True)

    cfg2 = bundle.load_config(out)
    assert cfg2.class_token_index == cfg.class_token_index
    assert cfg2.backbone.hidden_size == 32

    loaded = bundle.load_params(out)
    flat_a = bundle.flatten_tree(params)
    flat_b = bundle.flatten_tree(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])

    q = bundle.load_params(out, quantized=True)
    qflat = bundle.flatten_tree(q)
    assert any(k.endswith("w_q") for k in qflat)

    goldens = bundle.load_goldens(out)
    assert len(goldens) == 1 and len(goldens[0]["logits"]) == 1

    tok2 = PromptTokenizer.from_file(bundle.tokenizer_path(out))
    assert tok2.label_token_id == tok.label_token_id


def test_golden_logit_regression_jax_vs_bundle(tiny_tokenizer_file, tmp_path):
    """The engine-side golden gate: load bundle, re-run the golden samples on
    the JAX fp32 path, assert atol 1e-3 (reference test_onnx.py:30 pattern)."""
    from gliclass.c_tpu.convert import bundle
    from gliclass.c_tpu.convert.convert import export_bundle
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    model = build_torch_gliclass(cfg)
    out = str(tmp_path / "bundle")
    export_bundle(
        model, cfg, tok, out,
        golden_samples=[(TEXTS, LABELS, True)],
    )

    cfg2 = bundle.load_config(out)
    params = jax.tree.map(jnp.asarray, bundle.load_params(out))
    for rec in bundle.load_goldens(out):
        prompts = pack_prompts(rec["texts"], rec["labels"], rec["same_labels"], rec["prompt_first"])
        b = tok.encode_batch(prompts, max_length=rec["max_length"])
        n = max(len(l) for l in rec["labels"])
        got = np.asarray(
            gliclass_forward(params, jnp.asarray(b.input_ids),
                             jnp.asarray(b.attention_mask), cfg2, max_labels=n)
        )
        np.testing.assert_allclose(got, np.asarray(rec["logits"]), atol=1e-3)


def test_int8_quantized_model_close(tiny_tokenizer_file):
    """INT8 weight-only path stays within a loose logit tolerance of fp32
    (accuracy is ultimately gated by F1 delta, but logits should be close)."""
    from gliclass.c_tpu.ops.quant import quantize_tree

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    cfg = tiny_cfg(tok)
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch = _encode(tok, cfg, TEXTS, LABELS, True)
    ids, mask = jnp.asarray(batch.input_ids), jnp.asarray(batch.attention_mask)

    full = np.asarray(gliclass_forward(params, ids, mask, cfg, max_labels=4))
    qparams = quantize_tree(jax.tree.map(np.asarray, params))
    # the stacked backbone kernels must actually be quantized (tests/test_quant.py
    # covers the full inventory; this guards THIS test's premise)
    assert qparams["backbone"]["layers"]["attn"]["q"]["w_q"].dtype == np.int8
    assert qparams["backbone"]["layers"]["ffn"]["down"]["w_q"].dtype == np.int8
    qparams = jax.tree.map(jnp.asarray, qparams)
    quant = np.asarray(gliclass_forward(qparams, ids, mask, cfg, max_labels=4))
    assert np.isfinite(quant).all()
    assert np.abs(quant - full).max() > 1e-6, "int8 path was a silent no-op"
    np.testing.assert_allclose(quant, full, atol=0.15)
