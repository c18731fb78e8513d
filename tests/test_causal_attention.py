"""Causal flash attention kernel (ops/causal_attention.py) vs the XLA
einsum path (interpret mode on CPU — same kernel code that runs compiled on
TPU). Covers GQA grouping, multi-block online softmax, block-causal skip,
key-padding masks, and the end-to-end llama_encode route equivalence."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.ops.causal_attention import (
    causal_flash_attention,
    use_causal_flash,
)


def dense_reference(qg, k, v, mask):
    """[B,nkv,g,S,d] grouped causal attention, dense fp32."""
    B, nkv, g, S, d = qg.shape
    s = jnp.einsum("bkgid,bkjd->bkgij", qg, k) / math.sqrt(d)
    causal = np.tril(np.ones((S, S), dtype=bool))
    ok = jnp.asarray(causal)[None, None, None] & mask.astype(bool)[:, None, None, None, :]
    s = jnp.where(ok, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bkgij,bkjd->bkgid", p, v)


@pytest.mark.parametrize(
    "B,nkv,g,S,d",
    [
        (2, 2, 2, 16, 8),   # GQA, single block
        (1, 3, 1, 32, 8),   # MHA (g=1), single block
        (2, 2, 4, 32, 8),   # GQA, wide groups
    ],
)
def test_causal_flash_matches_dense(B, nkv, g, S, d):
    rng = np.random.default_rng(0)
    qg = jnp.asarray(rng.normal(size=(B, nkv, g, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[0, S - 3 :] = 0
    mask = jnp.asarray(mask)

    ref = np.asarray(dense_reference(qg, k, v, mask))
    out = np.asarray(
        causal_flash_attention(qg, k, v, mask, 1.0 / math.sqrt(d))
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, :, valid[b]], ref[b, :, :, valid[b]], atol=1e-5, rtol=1e-5
        )


def test_causal_flash_multiblock_recurrence(monkeypatch):
    """Force a small block so S spans several k-tiles: exercises the online
    softmax across blocks AND the block-causal compute skip + diagonal
    DMA remap (tiles above the diagonal contribute nothing)."""
    import gliclass.c_tpu.ops.causal_attention as ca

    monkeypatch.setattr(ca, "_pick_blk", lambda S: 8)
    B, nkv, g, S, d = 2, 2, 2, 32, 8
    rng = np.random.default_rng(1)
    qg = jnp.asarray(rng.normal(size=(B, nkv, g, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nkv, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nkv, S, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 5 :] = 0
    mask = jnp.asarray(mask)

    ref = np.asarray(dense_reference(qg, k, v, mask))
    out = np.asarray(
        ca.causal_flash_attention(qg, k, v, mask, 1.0 / math.sqrt(d))
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, :, valid[b]], ref[b, :, :, valid[b]], atol=1e-5, rtol=1e-5
        )


def test_llama_encode_flash_route_matches_xla(monkeypatch, llama_setup=None):
    """End-to-end: llama_encode with the flash route equals the XLA route
    (both in fp32) — the whole-model contract, not just the kernel."""
    from gliclass.c_tpu.config import BackboneConfig
    from gliclass.c_tpu.models.llama import init_llama_params, llama_encode

    bb = BackboneConfig(
        model_type="qwen2", vocab_size=128, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        rope_theta=10000.0, rms_norm_eps=1e-6,
    )
    params = init_llama_params(jax.random.key(0), bb)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    mask = np.ones((2, 16), dtype=np.int32)
    mask[1, 12:] = 0
    mask = jnp.asarray(mask)

    monkeypatch.setenv("GLICLASS_TPU_CAUSAL_ATTN", "xla")
    ref = np.asarray(llama_encode(params, ids, mask, bb))
    monkeypatch.setenv("GLICLASS_TPU_CAUSAL_ATTN", "flash")
    out = np.asarray(llama_encode(params, ids, mask, bb))
    valid = np.asarray(mask).astype(bool)
    for b in range(2):
        np.testing.assert_allclose(
            out[b, valid[b]], ref[b, valid[b]], atol=1e-5, rtol=1e-5
        )


def test_causal_route_predicate(monkeypatch):
    """'auto' stays on the XLA path until the measured verdict; 'flash'
    forces the kernel at any 8-aligned shape; 'xla' disables it."""
    monkeypatch.delenv("GLICLASS_TPU_CAUSAL_ATTN", raising=False)
    assert not use_causal_flash(96, 64)
    monkeypatch.setenv("GLICLASS_TPU_CAUSAL_ATTN", "flash")
    assert use_causal_flash(96, 64)
    assert not use_causal_flash(97, 64)
    monkeypatch.setenv("GLICLASS_TPU_CAUSAL_ATTN", "xla")
    assert not use_causal_flash(96, 64)
