"""Fused Pallas disentangled-attention kernel vs the XLA reference path
(interpret mode on CPU — same kernel code that runs compiled on TPU)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.models.deberta import rel_bias_columns, rel_to_abs
from gliclass.c_tpu.ops.fused_attention import fused_disentangled_attention


def xla_reference(q, k, v, pos_k_rel, pos_q_rel, mask, scale):
    """The models/deberta.py score path, inlined (fp32)."""
    c2p_rel = jnp.einsum("bhid,hmd->bhim", q, pos_k_rel)
    p2c_rel = jnp.einsum("bhjd,hmd->bhjm", k, pos_q_rel)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k)
    scores = scores + rel_to_abs(c2p_rel) + jnp.swapaxes(rel_to_abs(p2c_rel), -1, -2)
    scores = scores / scale
    key_ok = mask.astype(bool)[:, None, None, :]
    scores = jnp.where(key_ok, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


@pytest.mark.parametrize("S", [8, 16])
def test_fused_matches_xla(S):
    B, h, d = 2, 3, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 3 :] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    ref = np.asarray(xla_reference(q, k, v, pos_k, pos_q, mask, scale))
    out = np.asarray(
        fused_disentangled_attention(q, k, v, pos_k, pos_q, mask, scale)
    )
    valid = np.asarray(mask).astype(bool)
    # compare at valid query positions (padded rows are don't-care)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, valid[b]], ref[b, :, valid[b]], atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("S,blk", [(16, 8), (24, 8), (32, 16)])
def test_flash_matches_xla(S, blk):
    """Blocked/online-softmax kernel vs the XLA reference (interpret mode).

    Small blk exercises the multi-block online-softmax recurrence and the
    windowed position-table slicing (the TPU default is blk=128)."""
    from gliclass.c_tpu.ops.fused_attention import flash_disentangled_attention

    B, h, d = 2, 3, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 3 :] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    ref = np.asarray(xla_reference(q, k, v, pos_k, pos_q, mask, scale))
    out = np.asarray(
        flash_disentangled_attention(q, k, v, pos_k, pos_q, mask, scale, blk=blk)
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, valid[b]], ref[b, :, valid[b]], atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("S,blk", [(16, 8), (32, 8), (32, 16)])
def test_bias_route_matches_xla(S, blk):
    """abs_pos_table + table_bias_attention vs the XLA reference.

    Exercises the Pallas per-tile one-hot table builder (VMEM-resident skew
    one-hot) and the bias-fed fused softmax kernel (interpret mode — same
    kernel code that runs compiled on TPU)."""
    from gliclass.c_tpu.models.deberta import _abs_pos_table
    from gliclass.c_tpu.ops.fused_attention import (
        abs_pos_table,
        table_bias_attention,
    )

    B, h, d = 2, 3, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 3 :] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    ref = np.asarray(xla_reference(q, k, v, pos_k, pos_q, mask, scale))

    # Pallas table builder must equal the XLA one-hot skew exactly
    T = abs_pos_table(pos_k, S, blk=blk)
    np.testing.assert_array_equal(
        np.asarray(T), np.asarray(_abs_pos_table(pos_k, S))
    )

    out = np.asarray(
        table_bias_attention(q, k, v, pos_k, pos_q, mask, scale, blk=blk)
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, valid[b]], ref[b, :, valid[b]], atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("S,blk", [(16, 8), (32, 8), (32, 16)])
def test_tiled_route_matches_xla(S, blk):
    """windowed tables + tiled_bias_attention (the fully fused S>=512 serving
    route: in-kernel bias contractions, online softmax) vs the XLA reference
    (interpret mode — same kernel code that runs compiled on TPU)."""
    from gliclass.c_tpu.ops.fused_attention import tiled_bias_attention

    B, h, d = 4, 3, 8
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 3 :] = 0
    mask[3, 2:] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    ref = np.asarray(xla_reference(q, k, v, pos_k, pos_q, mask, scale))
    out = np.asarray(
        tiled_bias_attention(q, k, v, pos_k, pos_q, mask, scale, blk=blk)
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, valid[b]], ref[b, :, valid[b]], atol=1e-5, rtol=1e-5
        )


def test_windowed_tables_match_full_table():
    """Windowed builder vs the full [h, d, S, S] table: window w = jb - ib
    + n - 1 at (x, y) must equal T[:, :, ib*blk + x, jb*blk + y]."""
    from gliclass.c_tpu.models.deberta import _abs_pos_table
    from gliclass.c_tpu.ops.fused_attention import _windowed_tables_call

    h, S, d, blk = 2, 32, 8, 8
    n = S // blk
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.normal(size=(h, 2 * S - 1, d)).astype(np.float32))
    T = np.asarray(_abs_pos_table(pos, S))  # [h, d, S, S]
    Twin = np.asarray(_windowed_tables_call(pos, blk))  # [h, n_win, d, blk, blk]
    for ib in range(n):
        for jb in range(n):
            w = jb - ib + n - 1
            np.testing.assert_array_equal(
                Twin[:, w],
                T[:, :, ib * blk : (ib + 1) * blk, jb * blk : (jb + 1) * blk],
            )


def test_attn_route_env_overrides(monkeypatch):
    """GLICLASS_TPU_ATTN_ROUTE must genuinely force each path: a non-auto
    value disables every OTHER path's predicate (so 'table'/'xla' reach the
    XLA paths in models/deberta.py even at S >= 512) and force-enables its
    own at any compatible S (VERDICT r2 weak #4)."""
    from gliclass.c_tpu.ops import fused_attention as fa

    S, d = 512, 64
    dt = jnp.bfloat16
    preds = {
        "row": lambda: fa.fusable(S, d, dt),
        "bias": lambda: fa.use_bias_route(S, d, dt),
        "tiled": lambda: fa.use_tiled_route(S, d, dt),
        "flash": lambda: fa._use_flash(S),
    }
    for route, pred in preds.items():
        monkeypatch.setenv("GLICLASS_TPU_ATTN_ROUTE", route)
        assert pred(), f"route={route} must force its own path"
        for other, other_pred in preds.items():
            if other != route:
                assert not other_pred(), (
                    f"route={route} must disable the {other} path"
                )
    # 'table'/'xla' disable every kernel predicate -> XLA path runs
    for route in ("table", "xla"):
        monkeypatch.setenv("GLICLASS_TPU_ATTN_ROUTE", route)
        for name, pred in preds.items():
            assert not pred(), f"route={route} must disable the {name} path"
    # 'row' also engages below 512 (it could not before)
    monkeypatch.setenv("GLICLASS_TPU_ATTN_ROUTE", "row")
    assert fa.fusable(128, d, dt)


def test_fused_with_real_bias_columns():
    """End-to-end shape check with real bucketed columns (taken tables)."""
    from gliclass.c_tpu.models.deberta import log_bucket

    B, h, S, d, span = 1, 2, 16, 8, 8
    rng = np.random.default_rng(1)
    table_k = jnp.asarray(rng.normal(size=(h, 2 * span, d)).astype(np.float32))
    table_q = jnp.asarray(rng.normal(size=(h, 2 * span, d)).astype(np.float32))
    c2p_cols, p2c_cols = rel_bias_columns(S, span, 2 * span, 32)
    pos_k_rel = jnp.take(table_k, jnp.asarray(c2p_cols), axis=1)
    pos_q_rel = jnp.take(table_q, jnp.asarray(p2c_cols), axis=1)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    mask = jnp.ones((B, S), jnp.int32)
    scale = math.sqrt(d * 3)
    ref = np.asarray(xla_reference(q, k, v, pos_k_rel, pos_q_rel, mask, scale))
    out = np.asarray(
        fused_disentangled_attention(q, k, v, pos_k_rel, pos_q_rel, mask, scale)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("S,blk", [(16, 8), (32, 16)])
def test_bias_softmax_xla_impl_matches_pallas(S, blk, monkeypatch):
    """The XLA softmax back half (serving default; optimization-barrier'd
    score store) equals the Pallas bias kernel back half on the same
    tables/einsums — exactly at fp32 score storage, loosely at bf16."""
    from gliclass.c_tpu.ops.fused_attention import table_bias_attention

    B, h, d = 2, 3, 8
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[0, S - 2 :] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    monkeypatch.setenv("GLICLASS_TPU_BIAS_SOFTMAX", "pallas")
    ref = np.asarray(
        table_bias_attention(q, k, v, pos_k, pos_q, mask, scale, blk=blk)
    )
    monkeypatch.setenv("GLICLASS_TPU_BIAS_SOFTMAX", "xla")
    out32 = np.asarray(
        table_bias_attention(q, k, v, pos_k, pos_q, mask, scale, blk=blk)
    )
    np.testing.assert_allclose(out32, ref, atol=1e-5, rtol=1e-5)

    out_bf = np.asarray(
        table_bias_attention(
            q, k, v, pos_k, pos_q, mask, scale,
            score_dtype=jnp.bfloat16, blk=blk,
        ),
        dtype=np.float32,
    )
    np.testing.assert_allclose(out_bf, ref, atol=5e-2, rtol=5e-2)


def test_attn_auto_routing_boundary(monkeypatch):
    """The r5 MEASURED auto-routing boundary (see _use_flash's step table):
    bias owns large-batch S=512; flash owns the small-batch S=512 side
    (crossover B=16) and everything at S >= 1024 (where the bias route's
    multi-GB tables lose at B=8 and break the compile pipe at B >= 32);
    the explicit GLICLASS_TPU_ATTN_ROUTE=bias override still forces bias
    anywhere (A/B)."""
    import gliclass.c_tpu.ops.fused_attention as fa

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(fa.jax, "devices", lambda: [FakeDev()])
    monkeypatch.delenv("GLICLASS_TPU_ATTN_ROUTE", raising=False)
    monkeypatch.delenv("GLICLASS_TPU_FLASH_ATTN", raising=False)
    # S=512: batch decides (measured crossover B=16)
    assert fa.use_bias_route(512, 64, None, batch=128)
    assert fa.use_bias_route(512, 64, None, batch=32)
    assert not fa.use_bias_route(512, 64, None, batch=8)
    assert fa._use_flash(512, 8)
    assert fa._use_flash(512, 16)
    assert not fa._use_flash(512, 32)
    # S >= 1024: flash always, bias never
    for B in (8, 32, 128, None):
        assert fa._use_flash(1024, B)
        assert fa._use_flash(2048, B)
        assert not fa.use_bias_route(1024, 64, None, B)
        assert not fa.use_bias_route(2048, 64, None, B)
    # below 512: neither (XLA table path — closed, _small_bias_max_seq)
    assert not fa.use_bias_route(96, 64, None, batch=128)
    assert not fa._use_flash(384, 8)
    # unknown batch at S=512 keeps the conservative large-batch answer
    assert fa.use_bias_route(512, 64, None)
    assert not fa._use_flash(512)
    monkeypatch.setenv("GLICLASS_TPU_ATTN_ROUTE", "bias")
    assert fa.use_bias_route(2048, 64, None)  # explicit override only


@pytest.mark.parametrize("S", [12, 24])  # NOT divisible by blk: XLA builder path
def test_small_s_bias_route_matches_xla(S):
    """The small-S bias route (r5): for S not divisible by the Pallas table
    builder's blk, abs_pos_table falls back to the ONE-matmul XLA one-hot
    builder and table_bias_attention still runs the bias_fused softmax/PV
    kernel — the serving candidate for the dominant S<=128 buckets."""
    from gliclass.c_tpu.ops.fused_attention import table_bias_attention

    B, h, d = 2, 3, 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, h, S, d)).astype(np.float32))
    W = 2 * S - 1
    pos_k = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    pos_q = jnp.asarray(rng.normal(size=(h, W, d)).astype(np.float32))
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, S - 3 :] = 0
    mask = jnp.asarray(mask)
    scale = math.sqrt(d * 3)

    ref = np.asarray(xla_reference(q, k, v, pos_k, pos_q, mask, scale))
    out = np.asarray(
        table_bias_attention(q, k, v, pos_k, pos_q, mask, scale)
    )
    valid = np.asarray(mask).astype(bool)
    for b in range(B):
        np.testing.assert_allclose(
            out[b, :, valid[b]], ref[b, :, valid[b]], atol=1e-5, rtol=1e-5
        )


def test_small_bias_routing_knob(monkeypatch):
    """GLICLASS_TPU_SMALL_BIAS: opt-in small-S window for the bias route
    under auto routing (default OFF until the on-chip A/B verdict lands)."""
    import gliclass.c_tpu.ops.fused_attention as fa

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(fa.jax, "devices", lambda: [FakeDev()])
    monkeypatch.delenv("GLICLASS_TPU_ATTN_ROUTE", raising=False)
    monkeypatch.delenv("GLICLASS_TPU_SMALL_BIAS", raising=False)
    assert not fa.use_bias_route(96, 64, None)  # default: off below 512
    monkeypatch.setenv("GLICLASS_TPU_SMALL_BIAS", "1")
    assert fa.use_bias_route(96, 64, None)  # "1" -> ceiling 128
    assert fa.use_bias_route(128, 64, None)
    assert not fa.use_bias_route(192, 64, None)  # above the ceiling
    assert fa.use_bias_route(512, 64, None)  # S>=512 regime untouched
    monkeypatch.setenv("GLICLASS_TPU_SMALL_BIAS", "384")
    assert fa.use_bias_route(192, 64, None)  # integer ceiling override
    monkeypatch.setenv("GLICLASS_TPU_SMALL_BIAS", "0")
    assert not fa.use_bias_route(96, 64, None)
    # forced 'bias' now engages at ANY 8-aligned S (non-blk-divisible S
    # builds tables with the XLA one-hot)
    monkeypatch.setenv("GLICLASS_TPU_ATTN_ROUTE", "bias")
    assert fa.use_bias_route(96, 64, None)
    assert not fa.use_bias_route(97, 64, None)
