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
  * relative-position bucketing is computed on host at trace time (the
    sequence length is static per bucket), so it constant-folds into the
    executable — no gather-index math in the hot loop.
  * the disentangled c2p/p2c bias exploits its Toeplitz structure (buckets
    depend only on i-j): a static 1-D take on the projected position table, an
    einsum over the relative axis, and a pad/reshape/slice "skew"
    (:func:`rel_to_abs`) — no per-row gathers, which cost ~75% of the step
    time on TPU in the naive (torch-shaped) formulation.
  * every matmul (QKV/O, FFN, c2p/p2c position projections) goes through
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
def log_bucket(rel: np.ndarray, bucket_size: int, max_position: int) -> np.ndarray:
    """DeBERTa-v2 log-bucketing of relative distances (make_log_bucket_position
    semantics), vectorized over any numpy array of relative offsets."""
    rel = np.asarray(rel, dtype=np.int64)
    if bucket_size <= 0 or max_position <= 0:
        return rel.astype(np.int32)
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
    out = np.where(abs_pos <= mid, rel.astype(np.float64), log_pos * sign)
    return out.astype(np.int32)


def relative_position_bucket(
    query_size: int, key_size: int, bucket_size: int, max_position: int
) -> np.ndarray:
    """[query_size, key_size] int32 bucketed relative positions (q - k)."""
    q_ids = np.arange(query_size, dtype=np.int64)
    k_ids = np.arange(key_size, dtype=np.int64)
    return log_bucket(q_ids[:, None] - k_ids[None, :], bucket_size, max_position)


def rel_bias_columns(
    seq_len: int, att_span: int, bucket_size: int, max_position: int
) -> tuple[np.ndarray, np.ndarray]:
    """Static gather columns for the Toeplitz disentangled-attention bias.

    The bucketed relative position depends only on (i - j), so the 2-D gather
    of the torch reference (take_along_axis over an [S, S] index matrix — slow
    on TPU) collapses to indexing the position table with a 1-D vector over
    relative offsets. With m = j - i + S - 1 (the relative axis used by
    :func:`rel_to_abs`), i - j = S - 1 - m, and:

        c2p_cols[m] = clamp( bucket(S-1-m) + span, 0, 2*span-1 )
        p2c_cols[m] = clamp(-bucket(S-1-m) + span, 0, 2*span-1 )
    """
    r = np.arange(seq_len - 1, -seq_len, -1)  # r[m] = S-1-m, m = 0..2S-2
    br = log_bucket(r, bucket_size, max_position)
    c2p = np.clip(br + att_span, 0, att_span * 2 - 1).astype(np.int32)
    p2c = np.clip(-br + att_span, 0, att_span * 2 - 1).astype(np.int32)
    return c2p, p2c


def rel_to_abs(x: jax.Array) -> jax.Array:
    """[..., S, 2S-1] relative-axis scores -> [..., S, S] absolute scores with
    out[..., i, j] = x[..., i, j - i + S - 1].

    The Music-Transformer "skew" trick: pad + reshape + slice — pure data
    movement that XLA lowers to cheap copies, replacing a per-row-varying
    gather that the TPU executes very slowly.
    """
    *lead, S, W = x.shape
    assert W == 2 * S - 1, (S, W)
    if S == 1:
        return x
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])  # [..., S, 2S]
    x = x.reshape(*lead, S * 2 * S)
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, S - 1)])
    x = x.reshape(*lead, S + 1, 2 * S - 1)
    return x[..., :S, S - 1 :]


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[..., S, H] -> [..., num_heads, S, head_dim]"""
    *lead, s, h = x.shape
    x = x.reshape(*lead, s, num_heads, h // num_heads)
    return jnp.moveaxis(x, -2, -3)


# Largest S for which the [h, d, S, S] absolute position tables (see
# _abs_pos_table) stay small enough that the table-skew bias path beats the
# relative-axis einsum + rel_to_abs path (table traffic is batch-independent:
# it wins whenever head_dim < 2*batch). Measured on v5e (B=128, base-v1.0
# INT8 full step): table-skew 66.2/116.9/413.9 ms at S=192/256/512 vs fused
# Pallas 110.7/147.3/409.3 and rel-axis 136.5/250.4/918.3 — table wins through
# S=384; at S=512 the fused kernel ties and uses ~400MB less HBM, so fused
# takes over there (ops/fused_attention.fusable). Very long sequences fall
# back to the relative-axis path to avoid multi-GB tables.
_TABLE_SKEW_MAX_SEQ = 384


def _skew_onehot(S: int, dtype) -> jax.Array:
    """[2S-1, S*S] one-hot skew operator: E[m, i*S + j] = 1 iff m = j - i + S-1.

    Lets :func:`_abs_pos_table` build the absolute position table with ONE MXU
    matmul instead of the pad/reshape/slice skew — XLA lowers those as layout-
    crossing copies that profiled at ~43% of the whole encoder step at S=192
    on v5e (the copies run ~6x slower than HBM speed-of-light because the
    [h,d,S,2S] -> [h,d,S*2S] reshape crosses tile boundaries). One-hot matmul
    is numerically exact: each output element is 1.0 * one source element.
    """
    rel = (np.arange(S)[None, :] - np.arange(S)[:, None] + S - 1).reshape(-1)
    m = jnp.arange(2 * S - 1, dtype=jnp.int32)
    return (m[:, None] == jnp.asarray(rel, dtype=jnp.int32)[None, :]).astype(dtype)


def _abs_pos_table(pos_rel: jax.Array, S: int) -> jax.Array:
    """[h, 2S-1, d] column-taken position rows -> [h, d, S, S] absolute table
    T[h, d, i, j] = pos_rel[h, j - i + S - 1, d].

    The disentangled bias is Toeplitz in (i, j), so the skew can be applied to
    the BATCH-INDEPENDENT position table instead of to [B, h, S, *] score
    tensors — the table then costs O(h·d·S²) instead of O(B·h·S²) HBM traffic
    per layer. Realized as a single [h·d, W] x [W, S²] one-hot matmul (see
    :func:`_skew_onehot`); the einsum against q/k happens in absolute
    coordinates afterwards.
    """
    h, W, d = pos_rel.shape
    E = _skew_onehot(S, pos_rel.dtype)
    x = jnp.moveaxis(pos_rel, -1, 1).reshape(h * d, W)
    T = jnp.dot(x, E, preferred_element_type=pos_rel.dtype)
    return T.reshape(h, d, S, S)


def disentangled_attention(
    p_attn: Params,
    x: jax.Array,
    rel_emb: jax.Array,
    pair_mask: jax.Array,
    c2p_cols: jax.Array,
    p2c_cols: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """One disentangled self-attention block (content + c2p + p2c scores).

    pair_mask: [B, S, S] bool — position (i, j) attends iff both i and j valid.
    c2p_cols/p2c_cols: [2S-1] int32 static bucket columns per relative offset
    (see :func:`rel_bias_columns`).
    """
    nh = cfg.num_attention_heads
    scale_factor = 1 + len(cfg.pos_att_type)
    scale = math.sqrt(cfg.head_dim * scale_factor)

    if "qkv" in p_attn:
        # Fused projection: one [H, 3H] matmul instead of three [H, H] — the
        # wider N keeps the MXU busy (measured 79.5 vs 3x41 TFLOP/s at the
        # base-v1.0 serving shape on v5e). Math-identical: each output column
        # block reduces over the same K, so q/k/v slices equal the unfused
        # matmuls. Built at engine load by fuse_qkv_params; the bundle keeps
        # the reference-shaped separate q/k/v tensors.
        qkv = linear(p_attn["qkv"], x, compute_dtype)
        Ho = qkv.shape[-1] // 3
        q = _split_heads(qkv[..., :Ho], nh)  # [B,h,S,d]
        k = _split_heads(qkv[..., Ho : 2 * Ho], nh)
        v = _split_heads(qkv[..., 2 * Ho :], nh)
    else:
        q = _split_heads(linear(p_attn["q"], x, compute_dtype), nh)  # [B,h,S,d]
        k = _split_heads(linear(p_attn["k"], x, compute_dtype), nh)
        v = _split_heads(linear(p_attn["v"], x, compute_dtype), nh)

    def _pos_qk():
        """Position projections of the (layernormed) relative embeddings.

        share_att_key=True (v3): reuse the content Q/K projections — via one
        slice of the fused matmul when fused. Returns (pos_q, pos_k) in
        [2K, H] layout (pre-head-split)."""
        if cfg.share_att_key and "qkv" in p_attn:
            r = linear(p_attn["qkv"], rel_emb, compute_dtype)
            Hp = r.shape[-1] // 3
            return r[..., :Hp], r[..., Hp : 2 * Hp]
        if cfg.share_att_key:
            pos_q_p, pos_k_p = p_attn["q"], p_attn["k"]
        else:
            pos_q_p = p_attn.get("pos_q", p_attn.get("q", p_attn.get("qkv")))
            pos_k_p = p_attn.get("pos_k", p_attn.get("k", p_attn.get("qkv")))
        return (
            linear(pos_q_p, rel_emb, compute_dtype),
            linear(pos_k_p, rel_emb, compute_dtype),
        )

    # Fused Pallas path: whole attention (content + c2p/p2c bias + softmax +
    # PV) in one VMEM-resident kernel — no [B,h,S,*] tensors touch HBM.
    if (
        cfg.relative_attention
        and key_mask is not None
        and set(cfg.pos_att_type) == {"c2p", "p2c"}
    ):
        from ..ops.fused_attention import (
            _use_flash,
            fusable,
            fused_disentangled_attention,
            table_bias_attention,
            tiled_bias_attention,
            use_bias_route,
            use_tiled_route,
        )

        S = x.shape[-2]
        B = x.shape[0]
        # _use_flash is checked here too (not only inside the fused call) so
        # the flash kernel engages at any flash-compatible (B, S) — its auto
        # window is the measured small-batch/long-context regime (r5:
        # S >= 1024 always, S = 512 at B <= 16; 6.3x over relaxis at
        # [4, 2048]) plus the GLICLASS_TPU_FLASH_ATTN=1 override.
        if (
            use_tiled_route(S, cfg.head_dim, compute_dtype)
            or use_bias_route(S, cfg.head_dim, compute_dtype, B)
            or fusable(S, cfg.head_dim, compute_dtype)
            or _use_flash(S, B)
        ):
            pos_q_flat, pos_k_flat = _pos_qk()
            pos_k = _split_heads(pos_k_flat, nh)
            pos_q = _split_heads(pos_q_flat, nh)
            pos_k_rel = jnp.take(pos_k, c2p_cols, axis=1)  # [h,2S-1,d]
            pos_q_rel = jnp.take(pos_q, p2c_cols, axis=1)
            bias_dtype = (
                jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
            )
            if use_tiled_route(S, cfg.head_dim, compute_dtype):
                ctx = tiled_bias_attention(
                    q, k, v, pos_k_rel, pos_q_rel, key_mask, scale,
                    score_dtype=bias_dtype,
                )
            elif use_bias_route(S, cfg.head_dim, compute_dtype, B):
                ctx = table_bias_attention(
                    q, k, v, pos_k_rel, pos_q_rel, key_mask, scale,
                    score_dtype=bias_dtype,
                )
            else:
                ctx = fused_disentangled_attention(
                    q, k, v, pos_k_rel, pos_q_rel, key_mask, scale
                )
            ctx = jnp.moveaxis(ctx, -3, -2).reshape(
                *x.shape[:-1], nh * cfg.head_dim
            )
            return linear(p_attn["o"], ctx, compute_dtype)

    # Score/bias tensors are [B,h,S,S]-sized — the layer's dominant HBM
    # traffic. In bf16 serving mode they stay bf16 (softmax still reduces in
    # fp32); in fp32 parity mode everything is fp32 (exactness vs torch).
    score_dtype = (
        jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
    )
    scores = (
        jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=score_dtype)
        / scale
    ).astype(score_dtype)

    if cfg.relative_attention:
        pos_q_flat, pos_k_flat = _pos_qk()
        # Toeplitz formulation: project the (2K) bucket table, take the rows for
        # each relative offset with a STATIC 1-D column vector (tiny gather on
        # the table, not on the [B,h,S,*] scores), einsum against q/k over the
        # relative axis, then skew relative->absolute. Numerically identical to
        # the reference's 2-D gather; ~50x faster on TPU (no big gathers).
        # Measured (r4, [128,12,96,96] v5e): the bias einsum itself runs at
        # 109 TFLOP/s bf16 (0.017 ms) — the route's residual is the
        # [B,h,S,S] elementwise/softmax pipeline, not these contractions.
        # An int8 x int8 variant of the einsum measured 10x SLOWER (11
        # TOP/s): XLA does not lower batched contractions with free table
        # dims to the int8 MXU path — keep them bf16.
        S = x.shape[-2]
        use_table = S <= _TABLE_SKEW_MAX_SEQ
        if "c2p" in cfg.pos_att_type:
            pos_k = _split_heads(pos_k_flat, nh)  # [h,2K,d]
            pos_k_rel = jnp.take(pos_k, c2p_cols, axis=1)  # [h,2S-1,d]
            if use_table:
                c2p = jnp.einsum(
                    "bhid,hdij->bhij", q, _abs_pos_table(pos_k_rel, S),
                    preferred_element_type=score_dtype,
                ).astype(score_dtype)
            else:
                c2p_rel = jnp.einsum(
                    "bhid,hmd->bhim", q, pos_k_rel,
                    preferred_element_type=score_dtype,
                ).astype(score_dtype)
                c2p = rel_to_abs(c2p_rel)
            scores = scores + c2p / scale
        if "p2c" in cfg.pos_att_type:
            pos_q = _split_heads(pos_q_flat, nh)
            pos_q_rel = jnp.take(pos_q, p2c_cols, axis=1)  # [h,2S-1,d]
            if use_table:
                p2c = jnp.einsum(
                    "bhjd,hdji->bhij", k, _abs_pos_table(pos_q_rel, S),
                    preferred_element_type=score_dtype,
                ).astype(score_dtype)
            else:
                p2c_rel = jnp.einsum(
                    "bhjd,hmd->bhjm", k, pos_q_rel,
                    preferred_element_type=score_dtype,
                ).astype(score_dtype)
                p2c = jnp.swapaxes(rel_to_abs(p2c_rel), -1, -2)
            scores = scores + p2c / scale

    neg = jnp.asarray(_NEG_INF, score_dtype) if score_dtype == jnp.float32 else jnp.asarray(-1e4, score_dtype)
    scores = jnp.where(pair_mask[:, None, :, :], scores, neg)
    from ..ops.layers import masked_softmax

    probs = masked_softmax(scores).astype(compute_dtype)
    ctx = jnp.einsum("bhij,bhjd->bhid", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(compute_dtype)
    ctx = jnp.moveaxis(ctx, -3, -2).reshape(*x.shape[:-1], nh * cfg.head_dim)
    return linear(p_attn["o"], ctx, compute_dtype)


def encoder_layer(
    p: Params,
    x: jax.Array,
    rel_emb: jax.Array,
    pair_mask: jax.Array,
    c2p_cols: jax.Array,
    p2c_cols: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """Post-LN transformer layer: attn -> add&norm -> FFN -> add&norm."""
    attn_out = disentangled_attention(
        p["attn"], x, rel_emb, pair_mask, c2p_cols, p2c_cols, cfg, compute_dtype,
        key_mask,
    )
    x = layer_norm(p["attn"]["ln"], attn_out + x, cfg.layer_norm_eps)
    # FFN through ops/fused_ffn.py: by default this composes the same
    # linear/activation/linear the reference's ONNX graph runs op-by-op
    # (measured fastest in-graph); GLICLASS_TPU_FUSED_FFN=1 routes the
    # VMEM-resident fused Pallas kernel for A/B.
    from ..ops.fused_ffn import fused_ffn

    h = fused_ffn(p["ffn"]["up"], p["ffn"]["down"], x, cfg.hidden_act,
                  compute_dtype)
    return layer_norm(p["ffn"]["ln"], h + x, cfg.layer_norm_eps)


def conv_layer(
    p: Params,
    embed_out: jax.Array,
    layer0_out: jax.Array,
    attention_mask: jax.Array,
    cfg: BackboneConfig,
    compute_dtype,
) -> jax.Array:
    """DeBERTa-v2 conv stem (conv_kernel_size > 0; deberta-v2-xlarge family).

    Semantics match transformers' ``ConvLayer`` applied after encoder layer 0:
    same-padded 1-D conv over the *embedding* output, zero padded positions,
    activation, residual-add onto layer 0's output, LayerNorm, re-mask. In the
    reference this runs opaquely inside the ONNX graph (src/model.c:173-182);
    here it is explicit and parity-tested vs transformers.
    """
    k = cfg.conv_kernel_size
    if k % 2 == 0:
        raise ValueError("conv_kernel_size must be odd (torch same-padding)")
    pad = (k - 1) // 2
    x = embed_out.astype(compute_dtype)
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(compute_dtype),  # [k, H_in, H_out]
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + p["b"].astype(jnp.float32)
    m = attention_mask[..., None].astype(jnp.float32)
    out = activation(cfg.conv_act)(out * m).astype(compute_dtype)
    y = layer_norm(p["ln"], layer0_out + out, cfg.layer_norm_eps)
    return y * m.astype(y.dtype)


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
    return_all_layers: bool = False,
) -> jax.Array:
    """Full encoder forward: [B, S] ids + mask -> [B, S, H] hidden states.

    With ``return_all_layers`` returns stacked states [L+1, B, S, H] matching
    transformers' ``output_hidden_states`` order (embedding output first, then
    each layer's output, conv-merged at layer 0) — consumed by the
    ``squeeze_layers`` LayersFuser.
    """
    B, S = input_ids.shape
    x = embed(params["embeddings"], input_ids, attention_mask, cfg, compute_dtype)

    mask_b = attention_mask.astype(bool)
    pair_mask = mask_b[:, :, None] & mask_b[:, None, :]

    max_rel = cfg.max_relative_positions
    if max_rel < 1:
        max_rel = cfg.max_position_embeddings
    att_span = cfg.position_buckets if cfg.position_buckets > 0 else max_rel
    c2p_np, p2c_np = rel_bias_columns(S, att_span, cfg.position_buckets, max_rel)
    c2p_cols = jnp.asarray(c2p_np)
    p2c_cols = jnp.asarray(p2c_np)

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

    def body(x, layer_params):
        y = encoder_layer(
            layer_params, x, rel_emb, pair_mask, c2p_cols, p2c_cols, cfg,
            compute_dtype, attention_mask
        )
        return y, (y if return_all_layers else None)

    embed_out = x
    if cfg.conv_kernel_size > 0:
        # Conv stem applies after layer 0 (transformers DebertaV2Encoder:
        # `if i == 0 and self.conv is not None`), so layer 0 runs unstacked
        # and the scan covers layers 1..L-1.
        layer0 = jax.tree.map(lambda a: a[0], layers)
        rest = jax.tree.map(lambda a: a[1:], layers)
        y0, _ = body(x, layer0)
        x0 = conv_layer(params["conv"], x, y0, attention_mask, cfg, compute_dtype)
        x, ys = jax.lax.scan(body, x0, rest)
        if return_all_layers:
            return jnp.concatenate([jnp.stack([embed_out, x0]), ys], axis=0)
    else:
        x, ys = jax.lax.scan(body, x, layers)
        if return_all_layers:
            return jnp.concatenate([embed_out[None], ys], axis=0)
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
    if cfg.conv_kernel_size > 0:
        params["conv"] = {
            "w": jax.random.normal(
                keys[3], (cfg.conv_kernel_size, H, H), dtype
            ) * 0.02,
            "b": jnp.zeros((H,), dtype),
            "ln": _ln(H, dtype),
        }
    return params
