"""InferenceEngine-level tests: dtype modes, unsupported-config errors,
longer sequences exercising log-bucketed relative positions, bf16 sanity."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
from gliclass.c_tpu.engine import InferenceEngine
from gliclass.c_tpu.models.gliclass import gliclass_forward, init_gliclass_params
from gliclass.c_tpu.tokenization import TokenizedBatch


def tiny_cfg(**over):
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=200, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True, position_biased_input=False,
    )
    kw = dict(hidden_size=32, class_token_index=7, backbone=bb)
    kw.update(over)
    return GLiClassConfig(**kw)


def make_batch(n=4, s=24, L=3, class_token=7, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(10, 190, size=(n, s)).astype(np.int32)
    for k in range(L):
        ids[:, 1 + 2 * k] = class_token
    mask = np.ones((n, s), dtype=np.int32)
    return TokenizedBatch(ids, mask, np.full(n, s, dtype=np.int32))


def test_bf16_mode_close_to_fp32():
    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch = make_batch()
    e32 = InferenceEngine(cfg, params, RuntimeConfig(compute_dtype="float32"))
    e16 = InferenceEngine(cfg, params, RuntimeConfig(compute_dtype="bfloat16"))
    p32 = e32.run(batch, max_labels=4)
    p16 = e16.run(batch, max_labels=4)
    assert np.isfinite(p16).all()
    np.testing.assert_allclose(p16, p32, atol=0.05)


def test_unsupported_features_raise():
    params = init_gliclass_params(jax.random.key(0), tiny_cfg())
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="architecture_type"):
        gliclass_forward(params, ids, mask, tiny_cfg(architecture_type="bi-encoder"), 4)


def test_lstm_and_squeeze_layers_forward():
    """use_lstm / squeeze_layers are supported end-to-end (random init)."""
    cfg = tiny_cfg(use_lstm=True, squeeze_layers=True)
    params = init_gliclass_params(jax.random.key(0), cfg)
    batch = make_batch()
    out = gliclass_forward(
        params, jnp.asarray(batch.input_ids), jnp.asarray(batch.attention_mask),
        cfg, 4,
    )
    assert out.shape == (4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_long_sequence_log_bucket_parity():
    """S well beyond the linear bucket window (log region) vs torch."""
    import torch

    from gliclass.c_tpu.convert.hf_backbones import (
        backbone_config_from_hf,
        convert_deberta_state_dict,
    )
    from gliclass.c_tpu.models.deberta import deberta_encode
    from transformers import DebertaV2Config, DebertaV2Model

    torch.manual_seed(0)
    hf_cfg = DebertaV2Config(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=128, relative_attention=True,
        position_buckets=16, norm_rel_ebd="layer_norm", share_att_key=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-7, type_vocab_size=0,
    )
    model = DebertaV2Model(hf_cfg).eval()
    rng = np.random.default_rng(5)
    S = 96  # mid = 8, so most relative offsets are in the log region
    ids = rng.integers(1, 120, size=(1, S)).astype(np.int32)
    mask = np.ones((1, S), dtype=np.int32)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    cfg = backbone_config_from_hf(hf_cfg)
    params = jax.tree.map(jnp.asarray, convert_deberta_state_dict(model.state_dict(), cfg))
    out = np.asarray(
        deberta_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-4)


def test_step_cache_reuse():
    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(0), cfg)
    engine = InferenceEngine(cfg, params, RuntimeConfig(compute_dtype="float32"))
    engine.run(make_batch(s=24), max_labels=4)
    engine.run(make_batch(s=24, seed=1), max_labels=4)
    assert len(engine._steps) == 1  # same (S, L) bucket -> one executable
    engine.run(make_batch(s=32), max_labels=4)
    assert len(engine._steps) == 2


def test_fused_qkv_matches_unfused():
    """fuse_qkv is math-identical: disjoint output columns of one wide matmul
    equal the three separate projections (engine.fuse_qkv_params)."""
    from gliclass.c_tpu.ops.quant import quantize_tree

    cfg = tiny_cfg()
    params = init_gliclass_params(jax.random.key(1), cfg)
    batch = make_batch(seed=3)
    for quant, p in (("none", params), ("int8", quantize_tree(params))):
        rt = dict(compute_dtype="float32", quant_mode=quant)
        fused = InferenceEngine(cfg, p, RuntimeConfig(fuse_qkv=True, **rt))
        plain = InferenceEngine(cfg, p, RuntimeConfig(fuse_qkv=False, **rt))
        assert "qkv" in jax.tree_util.tree_structure(fused.params).__str__()
        np.testing.assert_allclose(
            fused.run(batch, max_labels=4),
            plain.run(batch, max_labels=4),
            atol=1e-6,
        )


def test_engine_warmup_precompiles_serving_set(tiny_tokenizer_file):
    """warmup() touches every (seq, row, label) bucket executable so first
    real traffic finds them compiled (r5 serving cold-start fix), and
    max_seq skips long buckets."""
    import jax

    from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
    from gliclass.c_tpu.engine import InferenceEngine
    from gliclass.c_tpu.models.gliclass import init_gliclass_params
    from gliclass.c_tpu.tokenization import PromptTokenizer

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True,
        position_biased_input=False,
    )
    cfg = GLiClassConfig(
        hidden_size=32, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )
    rt = RuntimeConfig(
        batch_size=4, max_length=64, compute_dtype="float32",
        seq_buckets=(16, 32, 64), label_buckets=(2, 4),
    )
    eng = InferenceEngine(cfg, init_gliclass_params(jax.random.key(0), cfg), rt)
    msgs = []
    n = eng.warmup(log=msgs.append, stack_depths=(2,))
    # 3 seqs x 2 labels x (row buckets {1,2,4} + 1 stacked depth)
    assert n == 3 * 2 * 4
    assert len(msgs) == 3
    # every (seq, label) jit wrapper exists in the step cache
    for s in (16, 32, 64):
        for lb in (2, 4):
            assert (s, lb) in eng._steps or any(
                k[:2] == (s, lb) for k in eng._steps if not isinstance(k[0], str)
            )
    # max_seq skips the 64 bucket; stack_depths=() warms singles only
    eng2 = InferenceEngine(cfg, eng.params, rt)
    assert eng2.warmup(max_seq=32, stack_depths=()) == 2 * 2 * 3
