"""Fused FFN Pallas kernel (ops/fused_ffn.py) vs the composed ops.layers
path — the HBM-round-trip elimination must be numerics-neutral (within the
bf16 inter-stage rounding the composed path itself performs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gliclass.c_tpu.ops.fused_ffn import _fused_ffn_pallas, fused_ffn
from gliclass.c_tpu.ops.layers import act_quant, activation, linear
from gliclass.c_tpu.ops.quant import quantize_dense_param

M, H, I = 16, 128, 256


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    w_up = (rng.standard_normal((H, I)) * 0.1).astype(np.float32)
    b_up = (rng.standard_normal((I,)) * 0.05).astype(np.float32)
    w_dn = (rng.standard_normal((I, H)) * 0.1).astype(np.float32)
    b_dn = (rng.standard_normal((H,)) * 0.05).astype(np.float32)
    p_up = quantize_dense_param({"w": w_up, "b": b_up})
    p_dn = quantize_dense_param({"w": w_dn, "b": b_dn})
    x = (rng.standard_normal((M, H)) * 0.5).astype(np.float32)
    return p_up, p_dn, x


def _composed(p_up, p_dn, x, dtype, aq: bool):
    with act_quant(aq):
        h = linear(p_up, jnp.asarray(x, dtype), dtype)
        h = activation("gelu")(h)
        return np.asarray(linear(p_dn, h, dtype), dtype=np.float32)


def _numpy_mirror_w8a8(p_up, p_dn, x):
    """Exact f32 mirror of the w8a8 kernel math (incl. per-row int8 quant)."""

    def rq(v):
        s = np.maximum(np.abs(v).max(axis=-1, keepdims=True) / 127.0, 1e-10)
        # banker's rounding matches jnp.round
        return np.rint(v / s).astype(np.int32), s

    wu = np.asarray(p_up["w_q"], np.int32)
    wd = np.asarray(p_dn["w_q"], np.int32)
    su = np.asarray(p_up["scale"], np.float32)
    sd = np.asarray(p_dn["scale"], np.float32)
    bu = np.asarray(p_up["b"], np.float32)
    bd = np.asarray(p_dn["b"], np.float32)

    def gelu_tanh(v):
        return 0.5 * v * (1 + np.tanh(np.sqrt(2 / np.pi) * (v + 0.044715 * v**3)))

    # input arrives as bf16 (the engine's compute dtype)
    xb = x.astype(jnp.bfloat16).astype(np.float32)
    xq, sx = rq(xb)
    h = (xq @ wu).astype(np.float32) * sx * su + bu
    h = gelu_tanh(h)
    hq, sh = rq(h)
    return (hq @ wd).astype(np.float32) * sh * sd + bd


def _run_aq(p_up, p_dn, x):
    with act_quant(True):
        return fused_ffn(p_up, p_dn, jnp.asarray(x, jnp.bfloat16), "gelu",
                         jnp.bfloat16, interpret=True)


@pytest.mark.parametrize("aq", [True, False])
def test_fused_kernel_matches_composed(params, aq):
    p_up, p_dn, x = params
    if aq:
        fused = np.asarray(_run_aq(p_up, p_dn, x), dtype=np.float32)
    else:
        fused = np.asarray(
            fused_ffn(p_up, p_dn, jnp.asarray(x, jnp.bfloat16), "gelu",
                      jnp.bfloat16, interpret=True),
            dtype=np.float32,
        )
    composed = _composed(p_up, p_dn, x, jnp.bfloat16, aq)
    scale = max(np.abs(composed).max(), 1.0)
    # bounded by the composed path's own bf16 inter-stage rounding
    assert np.max(np.abs(fused - composed)) / scale < 3e-2


def test_fused_kernel_matches_numpy_mirror(params):
    """Tight check of the w8a8 kernel math against an exact f32 mirror (the
    weight-only kernel computes in bf16 like the composed path, covered by
    the composed comparison above)."""
    p_up, p_dn, x = params
    fused = np.asarray(_run_aq(p_up, p_dn, x), dtype=np.float32)
    mirror = _numpy_mirror_w8a8(p_up, p_dn, x)
    scale = max(np.abs(mirror).max(), 1.0)
    # fused stores bf16 output; mirror is f32 -> bf16-level agreement
    assert np.max(np.abs(fused - mirror)) / scale < 8e-3


def test_ragged_rows_supported(params):
    """m not divisible by the tile: Pallas edge masking must keep the valid
    rows exact (padded garbage rows never reach the output)."""
    p_up, p_dn, x = params
    with act_quant(True):
        full = np.asarray(
            fused_ffn(p_up, p_dn, jnp.asarray(x, jnp.bfloat16), "gelu",
                      jnp.bfloat16, interpret=True))
        part = np.asarray(
            fused_ffn(p_up, p_dn, jnp.asarray(x[:8], jnp.bfloat16), "gelu",
                      jnp.bfloat16, interpret=True))
    np.testing.assert_allclose(part, full[:8], atol=2e-2, rtol=2e-2)


def test_fp32_and_odd_shapes_fall_back(params):
    """fp32 parity mode and off-grid shapes take the composed path exactly."""
    p_up, p_dn, x = params
    out = np.asarray(
        fused_ffn(p_up, p_dn, jnp.asarray(x), "gelu", jnp.float32,
                  interpret=True))
    ref = _composed(p_up, p_dn, x, jnp.float32, aq=False)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # odd H (not %128): composed even under interpret
    rng = np.random.default_rng(1)
    pu = quantize_dense_param(
        {"w": rng.standard_normal((100, I)).astype(np.float32), "b": None})
    pd = quantize_dense_param(
        {"w": rng.standard_normal((I, 100)).astype(np.float32), "b": None})
    x2 = rng.standard_normal((4, 100)).astype(np.float32)
    out2 = fused_ffn(pu, pd, jnp.asarray(x2, jnp.bfloat16), "gelu",
                     jnp.bfloat16, interpret=True)
    assert out2.shape == (4, 100)
