"""GLiClass scoring head: label-slot extraction, pooling, projectors, scorers.

The reference never sees this architecture explicitly — it executes inside the
exported ONNX graph (reference src/model.c:173-182 runs the whole graph; SURVEY
§7 "hard parts" #1). The structure here is reconstructed from the HF
``gliclass`` package (GLiClassUniEncoder + FeaturesProjector + scorers), which
is the upstream source of every exported checkpoint
(reference ONNX_CONVERTING/convert_to_onnx.py:48-62 drives that package). Param
naming mirrors the package (text_projector/classes_projector/linear_1/linear_2)
so real checkpoints map 1:1 at conversion time.

TPU-first notes:
  * label-slot extraction is a cumsum + one-hot einsum (an S x L matmul on the
    MXU), not a dynamic gather — static shapes, bucketed max label count.
  * padded label slots yield large-negative logits (sigmoid -> 0), so bucketing
    never changes decisions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import GLiClassConfig
from ..ops.layers import activation, linear

Params = dict[str, Any]

NEG_LOGIT = -1e4  # logit for padded label slots: sigmoid(-1e4) == 0.0 in fp32


def extract_label_embeddings(
    hidden: jax.Array,
    input_ids: jax.Array,
    class_token_id: int,
    max_labels: int,
) -> tuple[jax.Array, jax.Array]:
    """Gather hidden states at ``<<LABEL>>`` token positions into label slots.

    hidden [B,S,H], input_ids [B,S] -> (label_emb [B,L,H], label_mask [B,L])
    where L = max_labels. The k-th <<LABEL>> occurrence in a sequence fills slot
    k. Implemented as a one-hot matmul so it lowers to an MXU contraction.
    """
    is_label = input_ids == class_token_id  # [B,S]
    ordinal = jnp.cumsum(is_label.astype(jnp.int32), axis=-1) - 1  # [B,S]
    slots = jnp.arange(max_labels, dtype=jnp.int32)
    onehot = (ordinal[..., None] == slots) & is_label[..., None]  # [B,S,L]
    sel = onehot.astype(hidden.dtype)
    label_emb = jnp.einsum(
        "bsl,bsh->blh", sel, hidden, preferred_element_type=jnp.float32
    ).astype(hidden.dtype)
    counts = jnp.sum(is_label, axis=-1)  # [B]
    label_mask = slots[None, :] < counts[:, None]
    return label_emb, label_mask


def text_span_mask(
    input_ids: jax.Array,
    attention_mask: jax.Array,
    class_token_id: int,
    sep_token_id: int,
    prompt_first: bool,
) -> jax.Array:
    """Bool mask [B,S] selecting the raw-text tokens of a packed prompt.

    Supports ``extract_text_features``: the gliclass package pools only the
    text portion of the sequence instead of the whole prompt. The span is
    derived from the fixed prompt layouts of the packer (reference
    src/preprocessor.c:84-108):

      prompt_first=True : [CLS] <<LABEL>> l1 ... <<SEP>> text  [EOS]
      prompt_first=False: [CLS] text <<LABEL>> l1 ... <<SEP>>  [EOS]

    so text tokens are those strictly after the first ``<<SEP>>``
    (prompt-first) or strictly before the first ``<<LABEL>>`` (text-first),
    restricted to valid positions, never the tag tokens themselves.
    Reconstructed semantics (no published uni-encoder checkpoint sets the
    flag; see PARITY.md): the exact upstream pooling region is validated only
    against the independent torch mirror in convert/torch_ref.py. A row whose
    span is empty (e.g. empty text) falls back to all valid tokens.
    """
    valid = attention_mask.astype(bool)
    is_label = input_ids == class_token_id
    is_sep = input_ids == sep_token_id
    if prompt_first:
        cum_sep = jnp.cumsum(is_sep.astype(jnp.int32), axis=-1)
        after_first_sep = (cum_sep - is_sep.astype(jnp.int32)) >= 1
        span = after_first_sep & valid & ~is_sep & ~is_label
    else:
        before_first_label = jnp.cumsum(is_label.astype(jnp.int32), axis=-1) == 0
        span = before_first_label & valid & ~is_sep
    has_text = jnp.any(span, axis=-1, keepdims=True)
    return jnp.where(has_text, span, valid)


def pool_text(
    hidden: jax.Array,
    attention_mask: jax.Array,
    strategy: str,
    span: jax.Array | None = None,
) -> jax.Array:
    """Sequence -> single text representation [B,H].

    Strategies mirror the gliclass package poolers: 'first' (CLS token — used by
    the published v1.0 checkpoints), masked 'mean' / 'max' / 'sum'. With
    ``span`` (a [B,S] bool mask from :func:`text_span_mask`), pooling is
    restricted to the span and 'first' picks the first span token instead of
    position 0 (the ``extract_text_features`` path).
    """
    if strategy == "first":
        if span is None:
            return hidden[:, 0]
        first = jnp.argmax(span, axis=-1)  # first True position per row
        return jnp.take_along_axis(hidden, first[:, None, None], axis=1)[:, 0]
    m = (attention_mask if span is None else span)[..., None].astype(hidden.dtype)
    if strategy == "mean":
        return jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if strategy == "sum":
        return jnp.sum(hidden * m, axis=1)
    if strategy == "max":
        neg = jnp.finfo(hidden.dtype).min
        return jnp.max(jnp.where(m > 0, hidden, neg), axis=1)
    raise ValueError(f"unsupported pooling_strategy: {strategy!r}")


def features_projector(p: Params, x: jax.Array, act_name: str, compute_dtype) -> jax.Array:
    """FeaturesProjector: Linear(H -> 4H) -> act -> Linear(4H -> H)."""
    h = linear(p["linear_1"], x, compute_dtype)
    h = activation(act_name)(h)
    return linear(p["linear_2"], h, compute_dtype)


def score_simple(text_rep: jax.Array, label_rep: jax.Array) -> jax.Array:
    """ScorerDot: logits[b,l] = <text_rep[b], label_rep[b,l]>."""
    return jnp.einsum(
        "bh,blh->bl", text_rep, label_rep, preferred_element_type=jnp.float32
    )


def score_mlp(p: Params, text_rep: jax.Array, label_rep: jax.Array,
              compute_dtype) -> jax.Array:
    """MLP scorer over [label; text; label*text] features -> scalar per label."""
    B, L, H = label_rep.shape
    t = jnp.broadcast_to(text_rep[:, None, :], (B, L, H))
    feats = jnp.concatenate([label_rep, t, label_rep * t], axis=-1)
    h = linear(p["mlp_1"], feats, compute_dtype)
    h = jax.nn.relu(h)
    return linear(p["mlp_2"], h, compute_dtype)[..., 0].astype(jnp.float32)


def score_weighted_dot(
    p: Params, text_rep: jax.Array, label_rep: jax.Array, compute_dtype
) -> jax.Array:
    """ScorerWeightedDot: project text/label reps to 2H, split in halves, score
    an MLP over [text_h0; label_h0; text_h1 * label_h1].

    Semantics reconstructed from the HF ``gliclass`` package's GLiNER-family
    scorer (the package is the upstream of every reference export; reference
    ONNX_CONVERTING/convert_to_onnx.py:48-62). No published v1.0 checkpoint uses
    this scorer; parity is gated against the independent torch reconstruction
    in convert/torch_ref.py.
    """
    B, L, H = label_rep.shape
    t2 = linear(p["proj_text"], text_rep, compute_dtype)  # [B, 2H]
    l2 = linear(p["proj_label"], label_rep, compute_dtype)  # [B, L, 2H]
    t2 = jnp.broadcast_to(t2[:, None, :], (B, L, 2 * H))
    feats = jnp.concatenate(
        [t2[..., :H], l2[..., :H], t2[..., H:] * l2[..., H:]], axis=-1
    )
    h = jax.nn.relu(linear(p["mlp_1"], feats, compute_dtype))
    return linear(p["mlp_2"], h, compute_dtype)[..., 0].astype(jnp.float32)


def fuse_layers(p: Params, states: jax.Array) -> jax.Array:
    """LayersFuser (``squeeze_layers``): softmax-weighted sum over all encoder
    states [N, B, S, H] (embedding output + each layer) -> [B, S, H].

    Reconstructed semantics (see :func:`score_weighted_dot` note); cross-parity
    tested against the torch reconstruction.
    """
    w = jax.nn.softmax(p["weights"].astype(jnp.float32))
    out = jnp.einsum(
        "n,nbsh->bsh", w, states.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(states.dtype)


def _lstm_scan(p: Params, x: jax.Array, mask: jax.Array) -> jax.Array:
    """One LSTM direction with pack_padded semantics over right-padded input:
    states freeze and outputs are 0 at masked steps. x [B,S,H], mask [B,S] bool
    -> [B,S,h]. torch gate order (i, f, g, o); b = b_ih + b_hh.
    """
    B, S, H = x.shape
    h_dim = p["w_hh"].shape[0]
    # Input contribution for all steps at once: one [B,S,4h] matmul on the MXU.
    xg = (
        jnp.einsum("bsh,hg->bsg", x, p["w_ih"], preferred_element_type=jnp.float32)
        + p["b"].astype(jnp.float32)
    )

    def step(carry, inp):
        h, c = carry
        g_x, m = inp  # [B,4h] f32, [B] bool
        z = g_x + jnp.dot(h, p["w_hh"], preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), jnp.where(m, h, 0.0)

    init = (
        jnp.zeros((B, h_dim), jnp.float32),
        jnp.zeros((B, h_dim), jnp.float32),
    )
    _, ys = jax.lax.scan(
        step, init, (jnp.moveaxis(xg, 1, 0), jnp.moveaxis(mask, 1, 0))
    )
    return jnp.moveaxis(ys, 0, 1)


def bilstm(p: Params, x: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Bidirectional LSTM over encoder states (``use_lstm``): H -> H (two H/2
    directions), matching torch nn.LSTM(bidirectional, batch_first) applied via
    pack_padded_sequence. The backward pass runs the masked scan on the flipped
    padded sequence: leading (flipped) pad steps carry the zero initial state,
    which is exactly "start at the last valid token".
    """
    mask = attention_mask.astype(bool)
    xf = x.astype(jnp.float32)
    y_f = _lstm_scan(p["fwd"], xf, mask)
    y_b = jnp.flip(
        _lstm_scan(p["bwd"], jnp.flip(xf, axis=1), jnp.flip(mask, axis=1)),
        axis=1,
    )
    return jnp.concatenate([y_f, y_b], axis=-1).astype(x.dtype)


def gliclass_head(
    params: Params,
    hidden: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: GLiClassConfig,
    max_labels: int,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """hidden [B,S,H] -> (logits f32 [B,max_labels], label_mask [B,max_labels]).

    Padded label slots are filled with NEG_LOGIT so downstream sigmoid gives 0.
    """
    label_emb, label_mask = extract_label_embeddings(
        hidden, input_ids, cfg.class_token_index, max_labels
    )
    span = None
    if cfg.extract_text_features:
        span = text_span_mask(
            input_ids, attention_mask, cfg.class_token_index,
            cfg.text_token_index, cfg.prompt_first,
        )
    text_rep = pool_text(hidden, attention_mask, cfg.pooling_strategy, span=span)

    text_rep = features_projector(
        params["text_projector"], text_rep, cfg.projector_hidden_act, compute_dtype
    )
    label_emb = features_projector(
        params["classes_projector"], label_emb, cfg.projector_hidden_act, compute_dtype
    )

    if cfg.normalize_features:
        text_rep = text_rep / jnp.maximum(
            jnp.linalg.norm(text_rep, axis=-1, keepdims=True), 1e-12
        )
        label_emb = label_emb / jnp.maximum(
            jnp.linalg.norm(label_emb, axis=-1, keepdims=True), 1e-12
        )

    if cfg.scorer_type == "simple":
        logits = score_simple(text_rep, label_emb)
    elif cfg.scorer_type == "mlp":
        logits = score_mlp(params["scorer"], text_rep, label_emb, compute_dtype)
    elif cfg.scorer_type == "weighted-dot":
        logits = score_weighted_dot(
            params["scorer"], text_rep, label_emb, compute_dtype
        )
    else:
        raise ValueError(f"unsupported scorer_type: {cfg.scorer_type!r}")

    if "logit_scale" in params:
        # Learned CLIP-style scale (present iff the converted checkpoint
        # carried the trained tensor; see convert/convert.py
        # load_checkpoint_state_dict and config.py logit_scale_init_value).
        logits = logits * jnp.exp(params["logit_scale"].astype(jnp.float32))

    logits = jnp.where(label_mask, logits.astype(jnp.float32), NEG_LOGIT)
    return logits, label_mask


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------
def _dense(key, d_in, d_out, dtype, std=0.02):
    return {
        "w": jax.random.normal(key, (d_in, d_out), dtype) * std,
        "b": jnp.zeros((d_out,), dtype),
    }


def init_head_params(key, cfg: GLiClassConfig, dtype=jnp.float32) -> Params:
    H = cfg.hidden_size
    ks = jax.random.split(key, 6)
    params: Params = {
        "text_projector": {
            "linear_1": _dense(ks[0], H, 4 * H, dtype),
            "linear_2": _dense(ks[1], 4 * H, H, dtype),
        },
        "classes_projector": {
            "linear_1": _dense(ks[2], H, 4 * H, dtype),
            "linear_2": _dense(ks[3], 4 * H, H, dtype),
        },
    }
    if cfg.scorer_type == "mlp":
        params["scorer"] = {
            "mlp_1": _dense(ks[4], 3 * H, H, dtype),
            "mlp_2": _dense(ks[5], H, 1, dtype),
        }
    elif cfg.scorer_type == "weighted-dot":
        kws = jax.random.split(ks[4], 4)
        params["scorer"] = {
            "proj_text": _dense(kws[0], H, 2 * H, dtype),
            "proj_label": _dense(kws[1], H, 2 * H, dtype),
            "mlp_1": _dense(kws[2], 3 * H, H, dtype),
            "mlp_2": _dense(kws[3], H, 1, dtype),
        }
    return params


def init_lstm_params(key, hidden_size: int, dtype=jnp.float32) -> Params:
    """Random-init BiLSTM params (H -> two H/2 directions), torch layout
    pre-transposed: w_ih [H, 4h], w_hh [h, 4h], b [4h]."""
    h = hidden_size // 2
    ks = jax.random.split(key, 4)

    def direction(k1, k2):
        return {
            "w_ih": jax.random.normal(k1, (hidden_size, 4 * h), dtype) * 0.02,
            "w_hh": jax.random.normal(k2, (h, 4 * h), dtype) * 0.02,
            "b": jnp.zeros((4 * h,), dtype),
        }

    return {"fwd": direction(ks[0], ks[1]), "bwd": direction(ks[2], ks[3])}
