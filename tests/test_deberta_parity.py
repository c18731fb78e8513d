"""Numerical parity of the from-scratch JAX DeBERTa-v2 encoder against
transformers.DebertaV2Model (PyTorch) on tiny random configs.

This is the correctness anchor for the backbone (SURVEY §7 step 3): the
reference's encoder math is opaque inside ONNX Runtime; here two independent
implementations (HF torch and our JAX) must agree to tight fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.convert.hf_backbones import (
    backbone_config_from_hf,
    convert_deberta_state_dict,
)
from gliclass.c_tpu.models.deberta import (
    deberta_encode,
    init_deberta_params,
    relative_position_bucket,
)


def make_torch_model(**over):
    import torch
    from transformers import DebertaV2Config, DebertaV2Model

    kw = dict(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        relative_attention=True,
        position_buckets=16,
        norm_rel_ebd="layer_norm",
        share_att_key=True,
        pos_att_type=["p2c", "c2p"],
        position_biased_input=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-7,
        type_vocab_size=0,
    )
    kw.update(over)
    torch.manual_seed(0)
    cfg = DebertaV2Config(**kw)
    model = DebertaV2Model(cfg).eval()
    return model, cfg


def run_both(model, hf_cfg, ids, mask):
    import torch

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    cfg = backbone_config_from_hf(hf_cfg)
    params = convert_deberta_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    out = deberta_encode(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg, compute_dtype=jnp.float32
    )
    return ref, np.asarray(out)


@pytest.mark.parametrize(
    "over",
    [
        {},  # v3-style: shared att key, log buckets, rel LN
        {"share_att_key": False},  # v2-style separate position projections
        {"position_buckets": -1, "norm_rel_ebd": "none"},  # plain rel attention
        {"relative_attention": False},  # vanilla BERT-style attention
        {"pos_att_type": ["c2p"]},
        {"conv_kernel_size": 3},  # deberta-v2-xlarge conv stem (tanh)
        {"conv_kernel_size": 3, "conv_act": "gelu", "share_att_key": False},
    ],
)
def test_parity_variants(over):
    model, hf_cfg = make_torch_model(**over)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), dtype=np.int32)
    mask[1, 7:] = 0
    ids[1, 7:] = 0
    ref, out = run_both(model, hf_cfg, ids, mask)
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-4)


def test_parity_longer_sequence_padding_invariance():
    """Logits at valid positions must not change when padding grows to a larger
    bucket — the guarantee that bucket padding (our divergence from the
    reference's pad-to-batch-max) is semantics-free."""
    model, hf_cfg = make_torch_model()
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 120, size=(1, 12)).astype(np.int32)
    mask = np.ones((1, 12), dtype=np.int32)
    ref, out12 = run_both(model, hf_cfg, ids, mask)

    ids_p = np.zeros((1, 32), dtype=np.int32)
    mask_p = np.zeros((1, 32), dtype=np.int32)
    ids_p[:, :12], mask_p[:, :12] = ids, mask
    _, out32 = run_both(model, hf_cfg, ids_p, mask_p)
    np.testing.assert_allclose(out32[:, :12], out12, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out12, ref, atol=2e-4, rtol=1e-4)


def test_rel_position_buckets_match_torch():
    import torch
    from transformers.models.deberta_v2.modeling_deberta_v2 import (
        build_relative_position,
    )

    q = torch.zeros(1, 20, 8)
    ref = build_relative_position(q, q, bucket_size=16, max_position=64)[0].numpy()
    ours = relative_position_bucket(20, 20, 16, 64)
    np.testing.assert_array_equal(ours, ref)


def test_init_and_forward_shapes():
    from gliclass.c_tpu.config import BackboneConfig

    cfg = BackboneConfig(
        vocab_size=100, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, position_buckets=8,
        max_position_embeddings=32,
    )
    params = init_deberta_params(jax.random.key(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    out = deberta_encode(params, ids, mask, cfg)
    assert out.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
