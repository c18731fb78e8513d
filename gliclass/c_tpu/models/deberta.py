"""DeBERTa-v2/v3 encoder, implemented from scratch in functional JAX.

This is the backbone of the gliclass-{small,base,large}-v1.0 checkpoints. In the
reference all of this math is opaque inside the ONNX graph executed by ONNX
Runtime (reference src/model.c:122-207); here it is a native JAX implementation,
numerically parity-tested against ``transformers.DebertaV2Model`` (the public
PyTorch semantics of the architecture).

Design (TPU-first):
  * parameters are a plain pytree; the L transformer layers are STACKED along a
    leading axis and executed with ``lax.scan`` — one compiled layer body
    regardless of depth (fast XLA compiles, clean pjit sharding of the stacked
    leaves).
  * the relative-position bucket matrix is computed on host at trace time (the
    sequence length is static per bucket), so it constant-folds into the
    executable — no gather-index math in the hot loop.
  * disentangled-attention gathers use `take_along_axis` over the bucket axis;
    every matmul (QKV/O, FFN, c2p/p2c position projections) goes through
    ``ops.linear`` and therefore supports the Pallas INT8 path.
  * all matmuls accumulate fp32 on the MXU; norms/softmax run fp32.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig
from ..ops.layers import activation, layer_norm, linear

Params = dict[str, Any]

_NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# Relative position buckets (log-bucketed, computed host-side at trace time).
# Semantics match DeBERTa-v2's make_log_bucket_position / build_relative_position.
# ---------------------------------------------------------------------------
def relative_position_bucket(
    query_size: int, key_size: int, bucket_size: int, max_position: int
) -> np.ndarray:
    """[query_size, key_size] int32 bucketed relative positions (q - k)."""
    q_ids = np.arange(query_size, dtype=np.int64)
    k_ids = np.arange(key_size, dtype=np.int64)
    rel = q_ids[:, None] - k_ids[None, :]
    if bucket_size > 0 and max_position > 0:
        sign = np.sign(rel)
        mid = bucket_size // 2
        abs_pos = np.where((rel < mid) & (rel > -mid), mid - 1, np.abs(rel)).astype(
            np.float64
        )
        log_pos = (
            np.ceil(
                np.log(abs_pos / mid) / math.log((max_position - 1) / mid) * (mid - 1)
            )
            + mid
        )
        rel = np.where(abs_pos <= mid, rel.astype(np.float64), log_pos * sign)
    return rel.astype(np.int32)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., S, H] -> [..., num_heads, S, head_dim]"""
    *lead, s, h = x.shape
    x = x.reshape(*lead, s, num_heads, h // num_heads)
    return jnp.moveaxis(x, -2, -3)


def disentangled_attention(
    p_attn: Params,
    x: jax.Array,
    rel_emb: jax.Array,
    pair_mask: jax.Array,
    c2p_pos: jax.Array,
    p2c_pos: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
) -> jax.Array:
    """One disentangled self-attention block (content + c2p + p2c scores).

    pair_mask: [B, S, S] bool — position (i, j) attends iff both i and j valid.
    c2p_pos/p2c_pos: [S, S] int32 gather indices into the 2K bucket axis.
    """
    nh = cfg.num_attention_heads
    scale_factor = 1 + len(cfg.pos_att_type)
    scale = math.sqrt(cfg.head_dim * scale_factor)

    q = _split_heads(linear(p_attn["q"], x, compute_dtype), nh)  # [B,h,S,d]
    k = _split_heads(linear(p_attn["k"], x, compute_dtype), nh)
    v = _split_heads(linear(p_attn["v"], x, compute_dtype), nh)

    scores = (
        jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        / scale
    )

    if cfg.relative_attention:
        # share_att_key=True (v3): position projections reuse the content Q/K
        # projections applied to the (layernormed) relative embeddings.
        if cfg.share_att_key:
            pos_q_p, pos_k_p = p_attn["q"], p_attn["k"]
        else:
            pos_q_p = p_attn.get("pos_q", p_attn["q"])
            pos_k_p = p_attn.get("pos_k", p_attn["k"])
        if "c2p" in cfg.pos_att_type:
            pos_k = _split_heads(linear(pos_k_p, rel_emb, compute_dtype), nh)  # [h,2K,d]
            c2p = jnp.einsum(
                "bhid,hkd->bhik", q, pos_k, preferred_element_type=jnp.float32
            )
            c2p = jnp.take_along_axis(
                c2p, c2p_pos[None, None, :, :], axis=-1
            )  # [B,h,S,S]
            scores = scores + c2p / scale
        if "p2c" in cfg.pos_att_type:
            pos_q = _split_heads(linear(pos_q_p, rel_emb, compute_dtype), nh)
            p2c = jnp.einsum(
                "bhjd,hkd->bhjk", k, pos_q, preferred_element_type=jnp.float32
            )
            p2c = jnp.take_along_axis(p2c, p2c_pos[None, None, :, :], axis=-1)
            scores = scores + jnp.swapaxes(p2c, -1, -2) / scale

    scores = jnp.where(pair_mask[:, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(compute_dtype)
    ctx = jnp.einsum("bhij,bhjd->bhid", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(compute_dtype)
    ctx = jnp.moveaxis(ctx, -3, -2).reshape(*x.shape[:-1], nh * cfg.head_dim)
    return linear(p_attn["o"], ctx, compute_dtype)


def encoder_layer(
    p: Params,
    x: jax.Array,
    rel_emb: jax.Array,
    pair_mask: jax.Array,
    c2p_pos: jax.Array,
    p2c_pos: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
) -> jax.Array:
    """Post-LN transformer layer: attn -> add&norm -> FFN -> add&norm."""
    attn_out = disentangled_attention(
        p["attn"], x, rel_emb, pair_mask, c2p_pos, p2c_pos, cfg, compute_dtype
    )
    x = layer_norm(p["attn"]["ln"], attn_out + x, cfg.layer_norm_eps)
    h = linear(p["ffn"]["up"], x, compute_dtype)
    h = activation(cfg.hidden_act)(h)
    h = linear(p["ffn"]["down"], h, compute_dtype)
    return layer_norm(p["ffn"]["ln"], h + x, cfg.layer_norm_eps)


def embed(p: Params, input_ids: jax.Array, attention_mask: jax.Array,
          cfg: BackboneConfig, compute_dtype) -> jax.Array:
    """Word embeddings -> (optional proj) -> LayerNorm -> zero padded positions."""
    x = jnp.take(p["word"], input_ids, axis=0).astype(compute_dtype)
    if "pos" in p and cfg.position_biased_input:
        s = input_ids.shape[-1]
        x = x + p["pos"][:s].astype(compute_dtype)
    if "proj" in p:
        x = linear(p["proj"], x, compute_dtype)
    x = layer_norm(p["ln"], x, cfg.layer_norm_eps)
    return x * attention_mask[..., None].astype(x.dtype)


def deberta_encode(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BackboneConfig,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Full encoder forward: [B, S] ids + mask -> [B, S, H] hidden states."""
    B, S = input_ids.shape
    x = embed(params["embeddings"], input_ids, attention_mask, cfg, compute_dtype)

    mask_b = attention_mask.astype(bool)
    pair_mask = mask_b[:, :, None] & mask_b[:, None, :]

    max_rel = cfg.max_relative_positions
    if max_rel < 1:
        max_rel = cfg.max_position_embeddings
    att_span = cfg.position_buckets if cfg.position_buckets > 0 else max_rel
    rel = relative_position_bucket(S, S, cfg.position_buckets, max_rel)
    c2p_pos = jnp.asarray(np.clip(rel + att_span, 0, att_span * 2 - 1))
    p2c_pos = jnp.asarray(np.clip(-rel + att_span, 0, att_span * 2 - 1))

    rel_emb = params.get("rel_embeddings")
    if rel_emb is not None:
        if cfg.norm_rel_ebd == "layer_norm":
            rel_emb = layer_norm(params["rel_ln"], rel_emb.astype(compute_dtype),
                                 cfg.layer_norm_eps)
        else:
            rel_emb = rel_emb.astype(compute_dtype)
    else:
        rel_emb = jnp.zeros((2 * att_span, cfg.hidden_size), compute_dtype)

    layers = params["layers"]
    if cfg.conv_kernel_size > 0:
        raise NotImplementedError(
            "conv_kernel_size > 0 (deberta-v2 xlarge conv stem) is not used by "
            "any GLiClass checkpoint and is not supported"
        )

    def body(x, layer_params):
        y = encoder_layer(
            layer_params, x, rel_emb, pair_mask, c2p_pos, p2c_pos, cfg, compute_dtype
        )
        return y, None

    x, _ = jax.lax.scan(body, x, layers)
    return x


# ---------------------------------------------------------------------------
# Initialization (random; real weights come from the converter)
# ---------------------------------------------------------------------------
def _dense(key, d_in, d_out, dtype, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (d_in, d_out), dtype) * std,
        "b": jnp.zeros((d_out,), dtype),
    }


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_deberta_params(key, cfg: BackboneConfig, dtype=jnp.float32) -> Params:
    H, I = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(key, 8)
    max_rel = cfg.max_relative_positions
    if max_rel < 1:
        max_rel = cfg.max_position_embeddings
    att_span = cfg.position_buckets if cfg.position_buckets > 0 else max_rel

    def layer(k):
        ks = jax.random.split(k, 6)
        return {
            "attn": {
                "q": _dense(ks[0], H, H, dtype),
                "k": _dense(ks[1], H, H, dtype),
                "v": _dense(ks[2], H, H, dtype),
                "o": _dense(ks[3], H, H, dtype),
                "ln": _ln(H, dtype),
            },
            "ffn": {
                "up": _dense(ks[4], H, I, dtype),
                "down": _dense(ks[5], I, H, dtype),
                "ln": _ln(H, dtype),
            },
        }

    layer_keys = jax.random.split(keys[2], cfg.num_hidden_layers)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys]
    )
    params: Params = {
        "embeddings": {
            "word": jax.random.normal(keys[0], (cfg.vocab_size, H), dtype) * 0.02,
            "ln": _ln(H, dtype),
        },
        "layers": stacked,
    }
    if cfg.relative_attention:
        params["rel_embeddings"] = (
            jax.random.normal(keys[1], (2 * att_span, H), dtype) * 0.02
        )
        if cfg.norm_rel_ebd == "layer_norm":
            params["rel_ln"] = _ln(H, dtype)
    return params
