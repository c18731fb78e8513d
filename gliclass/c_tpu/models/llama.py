"""Llama/Qwen2-style decoder backbone for GLiClass (causal encoder mode).

Supports the decoder-backbone GLiClass checkpoints — gliclass-qwen-1.5B-v1.0 and
gliclass-llama-1.3B-v1.0 — which the reference engine's launcher cannot handle
at all (reference Readme.md:91-95: "manual configuration is required"); native
support here is a capability addition per SURVEY §7 step 1.

Architecture (parity target: transformers LlamaModel / Qwen2Model):
  RMSNorm pre-norm blocks, rotary position embeddings, grouped-query attention,
  SwiGLU MLP, causal masking combined with the padding mask. The final RMSNorm
  is applied (hidden states equal `last_hidden_state` of the HF model).

TPU-first: stacked layers under lax.scan; RoPE tables computed at trace time;
GQA via head-group einsum (no repeat_kv materialization); all matmuls through
ops.linear (INT8-capable); fp32 softmax.

Attention route decision (measured r4+r5, qwen-1.5B geometry, w8a8, v5e):
the plain XLA einsum path below — which materializes [B, kv, g, S, S]
scores — runs at 0.53-0.59 of its byte-model SoL at the serving shapes.
r5 built the flash kernel the r4 scope note deferred
(ops/causal_attention.py: blocked online softmax, GQA-grouped M=g*blk MXU
tiles, block-causal skip) and measured it across block sizes: it LOSES at
[64,96] (69.6 vs 61.1 ms) and at best ties at [32,512] (202.5 vs 200.0;
smaller causal-skipping blocks are worse, 222-230 ms) — per-layer Pallas
scheduling barriers cancel the removed score traffic. XLA remains the
measured serving route; the kernel stays as a parity-tested A/B path
(GLICLASS_TPU_CAUSAL_ATTN=flash, closing analysis in use_causal_flash).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig
from ..ops.layers import linear, rms_norm

Params = dict[str, Any]

_NEG_INF = float(np.finfo(np.float32).min)


def rope_tables(seq_len: int, head_dim: int, theta: float) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables [S, head_dim] matching HF's rotary convention
    (duplicated half-frequencies: emb = cat(freqs, freqs))."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, h, S, D]; cos/sin [S, D] (HF rotate_half convention)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, None] + rot * sin[None, None]


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    *lead, s, h = x.shape
    x = x.reshape(*lead, s, num_heads, h // num_heads)
    return jnp.moveaxis(x, -2, -3)  # [..., h, S, d]


def llama_attention(
    p: Params,
    x: jax.Array,
    mask_bias: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
    attention_mask: jax.Array | None = None,
) -> jax.Array:
    nh, nkv, d = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim
    groups = nh // nkv

    q = _split_heads(linear(p["q"], x, compute_dtype), nh)  # [B,nh,S,d]
    k = _split_heads(linear(p["k"], x, compute_dtype), nkv)  # [B,nkv,S,d]
    v = _split_heads(linear(p["v"], x, compute_dtype), nkv)

    q = apply_rope(q, cos, sin).astype(compute_dtype)
    k = apply_rope(k, cos, sin).astype(compute_dtype)

    B, _, S, _ = q.shape
    qg = q.reshape(B, nkv, groups, S, d)

    from ..ops.causal_attention import causal_flash_attention, use_causal_flash

    if attention_mask is not None and use_causal_flash(S, d):
        # Blocked online-softmax kernel: no [B,nkv,g,S,S] score/probability
        # tensor ever touches HBM (ops/causal_attention.py).
        ctx = causal_flash_attention(
            qg, k, v, attention_mask, 1.0 / math.sqrt(d)
        ).astype(compute_dtype)
    else:
        # Score tensors stay in compute dtype in serving mode (bf16) to
        # halve HBM traffic; fp32 in parity mode. Softmax reduces in fp32.
        score_dtype = (
            jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
        )
        scores = (
            jnp.einsum(
                "bkgid,bkjd->bkgij", qg, k, preferred_element_type=score_dtype
            )
            / math.sqrt(d)
        ).astype(score_dtype)
        scores = scores + mask_bias[:, None, None, :, :].astype(score_dtype)
        from ..ops.layers import masked_softmax

        probs = masked_softmax(scores).astype(compute_dtype)
        ctx = jnp.einsum(
            "bkgij,bkjd->bkgid", probs, v, preferred_element_type=jnp.float32
        )
    ctx = ctx.astype(compute_dtype).reshape(B, nh, S, d)
    ctx = jnp.moveaxis(ctx, 1, 2).reshape(B, S, nh * d)
    return linear(p["o"], ctx, compute_dtype)


def llama_mlp(p: Params, x: jax.Array, compute_dtype) -> jax.Array:
    gate = jax.nn.silu(linear(p["gate"], x, compute_dtype))
    up = linear(p["up"], x, compute_dtype)
    return linear(p["down"], gate * up, compute_dtype)


def llama_encode(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BackboneConfig,
    compute_dtype=jnp.float32,
    return_all_layers: bool = False,
) -> jax.Array:
    """[B,S] -> [B,S,H] hidden states (post final norm).

    With ``return_all_layers`` returns stacked states [L+1, B, S, H] matching
    transformers' ``output_hidden_states`` order: embedding output, each
    layer's input state, and the post-final-norm output last (the raw last
    layer output never appears — same as LlamaModel/Qwen2Model).
    """
    B, S = input_ids.shape
    x = jnp.take(params["embeddings"]["word"], input_ids, axis=0).astype(compute_dtype)

    # Causal + padding mask as additive fp32 bias [B, S, S].
    causal = np.tril(np.ones((S, S), dtype=bool))
    key_ok = attention_mask.astype(bool)[:, None, :]  # [B,1,S]
    ok = jnp.asarray(causal)[None] & key_ok
    mask_bias = jnp.where(ok, 0.0, _NEG_INF).astype(jnp.float32)

    cos_np, sin_np = rope_tables(S, cfg.head_dim, cfg.rope_theta)
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

    def body(h, p):
        a = rms_norm(p["attn_norm"], h, cfg.rms_norm_eps)
        h2 = h + llama_attention(
            p["attn"], a, mask_bias, cos, sin, cfg, compute_dtype,
            attention_mask=attention_mask,
        )
        m = rms_norm(p["mlp_norm"], h2, cfg.rms_norm_eps)
        h2 = h2 + llama_mlp(p["mlp"], m, compute_dtype)
        # carry out; emit the layer INPUT (transformers records pre-layer states)
        return h2, (h if return_all_layers else None)

    out, ys = jax.lax.scan(body, x, params["layers"])
    final = rms_norm(params["final_norm"], out, cfg.rms_norm_eps)
    if return_all_layers:
        return jnp.concatenate([ys, final[None]], axis=0)
    return final


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------
def _dense(key, d_in, d_out, dtype, bias, std=0.02):
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_llama_params(key, cfg: BackboneConfig, dtype=jnp.float32) -> Params:
    H, I = cfg.hidden_size, cfg.intermediate_size
    nh, nkv, d = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim
    qkv_bias = cfg.attention_bias or cfg.model_type == "qwen2"
    keys = jax.random.split(key, 2 + cfg.num_hidden_layers)

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "attn": {
                "q": _dense(ks[0], H, nh * d, dtype, qkv_bias),
                "k": _dense(ks[1], H, nkv * d, dtype, qkv_bias),
                "v": _dense(ks[2], H, nkv * d, dtype, qkv_bias),
                "o": _dense(ks[3], nh * d, H, dtype, False),
            },
            "attn_norm": {"scale": jnp.ones((H,), dtype)},
            "mlp": {
                "gate": _dense(ks[4], H, I, dtype, False),
                "up": _dense(ks[5], H, I, dtype, False),
                "down": _dense(ks[6], I, H, dtype, False),
            },
            "mlp_norm": {"scale": jnp.ones((H,), dtype)},
        }

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[layer(k) for k in keys[2:]]
    )
    return {
        "embeddings": {
            "word": jax.random.normal(keys[0], (cfg.vocab_size, H), dtype) * 0.02
        },
        "layers": stacked,
        "final_norm": {"scale": jnp.ones((H,), dtype)},
    }
