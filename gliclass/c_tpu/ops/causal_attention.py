"""Causal flash attention (GQA-grouped) for the decoder backbones.

The XLA route in models/llama.py materializes [B, nkv, g, S, S] score and
probability tensors in HBM per layer — measured 0.53-0.59 of byte-model SoL
(r4 BENCH per-kernel tables) with the score-tensor traffic ~34% of per-layer
time at S=512. VERDICT r4 item 3: the disentangled kernels' losses (VPU skew
rolls, M=bb MXU starvation) came from the tied-row-index bias structure,
which causal attention DOES NOT HAVE — so a standard blocked online-softmax
kernel was never actually ruled out. This is that kernel:

  * grid (B, nkv/gk, n_q, n_k), k-blocks innermost (``arbitrary``) carrying
    the online-softmax recurrence in VMEM scratch;
  * GQA without repeat_kv: q arrives [B, nkv, g, S, d] (g = nh/nkv query
    heads per kv head) and each program flattens its q block to
    [gk, g*blk, d] — ONE batched MXU matmul per tile with M = g*blk rows
    (the grouped layout is what keeps the MXU fed; per-head M=blk would
    starve it at small blk);
  * causality at BLOCK granularity: tiles strictly above the diagonal are
    compute-skipped (@pl.when(ik <= iq)); the diagonal tile masks with a
    per-row iota compare. Their k/v DMAs are remapped to the diagonal block
    (index_map min(ik, iq)) so skipped steps do not stream unused bytes;
  * fp32 running max/sum/accumulator scratch; probabilities cast to v.dtype
    for the PV matmul (same numerics contract as the XLA path: fp32 score
    accumulation, fp32 softmax statistics).

Semantics (parity target: models/llama.py llama_attention == transformers
LlamaAttention/Qwen2Attention eager path): softmax over keys j <= i that are
valid under the padding mask, probabilities @ v. The reference engine cannot
run these checkpoints at all (reference Readme.md:91-95 "manual configuration
is required"); this kernel serves the capability-addition decoder family.

Routing: GLICLASS_TPU_CAUSAL_ATTN = 'auto' | 'flash' | 'xla'. 'flash'
forces the kernel anywhere (interpret mode on CPU for tests); 'xla' forces
the einsum path; 'auto' defers to the measured default (see
:func:`use_causal_flash`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per grid program (bytes) — same headroom rationale
# as ops/fused_attention._VMEM_BUDGET.
_VMEM_BUDGET = 8 * 1024 * 1024


def causal_route() -> str:
    """'auto' (measured routing) | 'flash' (force kernel) | 'xla' (force
    einsum path). Read at TRACE time, like GLICLASS_TPU_ATTN_ROUTE."""
    import os

    return os.environ.get("GLICLASS_TPU_CAUSAL_ATTN", "auto")


def use_causal_flash(S: int, d: int) -> bool:
    """Routing predicate consulted by models/llama.py (and priced by
    utils/perf.py through the same function)."""
    route = causal_route()
    shape_ok = S % 8 == 0 and d % 8 == 0
    if route == "flash":
        return shape_ok
    if route != "auto":
        return False
    # CLOSING ANALYSIS (r5, measured) — the kernel does NOT beat XLA at the
    # decoder serving shapes, ending VERDICT r4 item 3 with a negative
    # verdict. Whole w8a8 engine steps, qwen-1.5B geometry, v5e:
    #
    #   [64, 96]   xla 61.11 ms | flash(blk=96)  69.61 ms
    #   [32, 512]  xla 200.03   | flash(blk=512) 202.45 | blk=256 221.75
    #              | blk=128 230.07 ms
    #
    # Reading: (1) at blk=S the kernel computes the full S^2 square (no
    # causal skip) and still only TIES at S=512 — the [B,kv,g,S,S] score
    # traffic it removes (~200 MB/layer at [32,512]) is roughly cancelled
    # by the per-layer pallas_call scheduling barrier on this stack (the
    # ops/fused_ffn.py loss class); (2) SMALLER blocks, which do skip
    # above-diagonal tiles and halve the MXU work, are WORSE (222-230 ms)
    # — the step is not MXU-bound there, and per-tile grid overhead +
    # diagonal masking dominate the skipped FLOPs; (3) at [64,96] the score
    # tensors are 14 MB/layer — nothing to save, pure barrier cost (-14%).
    # The r4 scope note's extrapolation was right for the wrong reason:
    # causal attention has no skew rolls, but the XLA einsum path is
    # already fast enough that kernel scheduling overhead, not score
    # traffic, is the binding constraint at serving shapes. Kept as a
    # verified-correct A/B path (GLICLASS_TPU_CAUSAL_ATTN=flash).
    return False


def _pick_blk(S: int) -> int:
    """Largest power-of-two block <= 512 dividing S, else S itself (whole-row
    kernel; serving buckets are <= 128 or 128-multiples)."""
    for blk in (512, 256, 128):
        if S % blk == 0:
            return blk
    return S


def _pick_gk(nkv: int, g: int, blk: int, d: int, esize: int) -> int:
    """Largest divisor gk of nkv fitting the VMEM budget."""
    for gk in range(nkv, 0, -1):
        if nkv % gk:
            continue
        blocks = 2 * gk * (2 * g * blk * d + 2 * blk * d) * esize  # q/o + k/v
        interm = gk * g * blk * blk * 4 * 3  # s / p / mask temporaries
        scratch = gk * g * blk * d * 4 + 2 * gk * g * blk * 4
        if blocks + interm + scratch <= _VMEM_BUDGET:
            return gk
    return 1


def _kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, n_k, blk, g,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(ik <= iq)
    def _():
        gk = q_ref.shape[1]
        d = q_ref.shape[-1]
        q = q_ref[0].reshape(gk, g * blk, d)  # [gk, g*blk, d]
        k = k_ref[0]  # [gk, blk, d]
        v = v_ref[0]

        bdn = (((2,), (2,)), ((0,), (0,)))  # batch gk, contract d
        s = jax.lax.dot_general(
            q, k, bdn, preferred_element_type=jnp.float32
        ) * scale  # [gk, g*blk, blk]

        # causal + key-padding mask: flat row r covers query position
        # iq*blk + (r % blk) (g query heads stacked over the row axis).
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        qpos = iq * blk + jax.lax.rem(rows, blk)
        kpos = ik * blk + cols
        key_ok = mask_ref[0, 0] > 0  # [blk]
        ok = (kpos <= qpos) & key_ok[None, None, :]
        s = jnp.where(ok, s, -1e30)

        m_prev = m_ref[:]  # [gk, g*blk]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=-1)
        m_ref[:] = m_new

        pv = (((2,), (1,)), ((0,), (0,)))
        ctx = jax.lax.dot_general(
            p.astype(v.dtype), v, pv, preferred_element_type=jnp.float32
        )
        acc_ref[:] = acc_ref[:] * alpha[..., None] + ctx

    @pl.when(ik == n_k - 1)
    def _():
        gk = o_ref.shape[1]
        d = o_ref.shape[-1]
        l_fin = l_ref[:]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0] = (acc_ref[:] * l_inv[..., None]).astype(o_ref.dtype).reshape(
            gk, g, blk, d
        )


@functools.partial(jax.jit, static_argnames=("scale", "gk", "blk"))
def _flash_call(qg, k, v, mask, scale, gk, blk):
    B, nkv, g, S, d = qg.shape
    n = S // blk
    grid = (B, nkv // gk, n, n)

    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True

    # Above-diagonal (skipped) steps remap their k/v fetch to the diagonal
    # block: no fresh bytes stream for compute that never runs.
    def kv_map(b, j, iq, ik):
        return (b, j, jnp.minimum(ik, iq), 0)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_k=n, blk=blk, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, gk, g, blk, d), lambda b, j, iq, ik: (b, j, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gk, blk, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gk, blk, d), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda b, j, iq, ik: (b, 0, jnp.minimum(ik, iq)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, gk, g, blk, d), lambda b, j, iq, ik: (b, j, 0, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nkv, g, S, d), qg.dtype),
        scratch_shapes=[
            pltpu.VMEM((gk, g * blk, d), jnp.float32),
            pltpu.VMEM((gk, g * blk), jnp.float32),
            pltpu.VMEM((gk, g * blk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            # ~half the dense tile count does real work (block-causal skip)
            flops=2 * B * nkv * g * S * S * d * 2 // 2,
            bytes_accessed=B * nkv * (g + 1) * S * d * 2 * 2,
            transcendentals=B * nkv * g * S * S // 2,
        ),
        interpret=interpret,
    )(qg, k, v, mask)


def causal_flash_attention(
    qg: jax.Array,  # [B, nkv, g, S, d] grouped queries (g = nh / nkv)
    k: jax.Array,  # [B, nkv, S, d]
    v: jax.Array,  # [B, nkv, S, d]
    attention_mask: jax.Array,  # [B, S] (1 = valid key)
    scale: float,
) -> jax.Array:
    """softmax(scale * q·k^T + causal/padding mask) @ v, online-softmax
    blocked; returns [B, nkv, g, S, d] in qg.dtype."""
    B, nkv, g, S, d = qg.shape
    blk = _pick_blk(S)
    gk = _pick_gk(nkv, g, blk, d, jnp.dtype(qg.dtype).itemsize)
    return _flash_call(
        qg, k, v, attention_mask.astype(jnp.int32)[:, None, :], scale, gk, blk
    )
