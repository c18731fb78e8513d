"""Speed-of-light accounting: analytic step cost vs chip peaks.

BASELINE.md requires per-kernel speed-of-light accounting ("every INT8
dequant+matmul Pallas kernel at speed-of-light per chip"); the reference has no
instrumentation at all beyond one wall-clock line (reference main.c:170-171).
This module prices a GLiClass forward step analytically — MXU FLOPs and HBM
bytes per component — and turns a measured step time into utilization numbers
against the chip's peak matmul rate and HBM bandwidth, plus the
speed-of-light step time (max of the compute-bound and memory-bound minima).

The model intentionally counts only first-order terms (projection matmuls,
attention einsums, score-tensor traffic, weight reads, activation
residency); elementwise epilogues that XLA fuses are not double-counted.
Numbers are for ONE chip; under dp x sp x tp divide B / S / (H-shards)
accordingly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import GLiClassConfig


# Public per-chip peaks (bf16 matmul TFLOP/s, HBM GB/s).
CHIP_PEAKS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
}


@dataclass
class StepCost:
    """Per-step cost, broken down by component (FLOPs) and class (bytes)."""

    flops: dict[str, float] = field(default_factory=dict)
    hbm_bytes: dict[str, float] = field(default_factory=dict)

    @property
    def total_flops(self) -> float:
        return sum(self.flops.values())

    @property
    def total_bytes(self) -> float:
        return sum(self.hbm_bytes.values())


def gliclass_step_cost(
    cfg: GLiClassConfig,
    batch: int,
    seq: int,
    quant_mode: str = "int8",
    compute_dtype_bytes: int = 2,
) -> StepCost:
    """Analytic cost of one [batch, seq] forward step on one chip.

    Attention terms follow the serving path actually taken at this seq
    (models/deberta.py routing): the XLA table-skew bias for S <= 384 adds a
    one-hot skew matmul (2*h*d*W*S^2, batch-independent) plus batched bias
    einsums; the whole-row fused kernel at S = 512 replaces table traffic with
    in-kernel window matmuls of the same einsum FLOPs.
    """
    # Single source of truth for the attention-path routing threshold — the
    # cost model must price the path models/deberta.py actually takes.
    from ..models.deberta import _TABLE_SKEW_MAX_SEQ

    bb = cfg.backbone
    H, I, L = bb.hidden_size, bb.intermediate_size, bb.num_hidden_layers
    h, d = bb.num_attention_heads, bb.head_dim
    B, S = batch, seq
    M = B * S  # tokens per step
    W = 2 * S - 1
    act = compute_dtype_bytes
    wbytes = 1 if quant_mode == "int8" else act

    c = StepCost()
    # --- MXU FLOPs ---
    c.flops["qkv_o_proj"] = L * 4 * 2 * M * H * H
    c.flops["ffn"] = L * 2 * 2 * M * H * I
    c.flops["attn_content_pv"] = L * 2 * 2 * B * h * S * S * d
    if bb.relative_attention:
        # c2p + p2c bias einsums (both paths do these FLOPs, in- or out-kernel)
        c.flops["attn_rel_bias"] = L * 2 * 2 * B * h * S * S * d
        # position projections of the [2K, H] bucket table (pos_q + pos_k)
        K2 = 2 * (bb.position_buckets if bb.position_buckets > 0 else S)
        c.flops["pos_proj"] = L * 2 * 2 * K2 * H * H
        if S <= _TABLE_SKEW_MAX_SEQ:  # table-skew path: one-hot skew matmul
            c.flops["table_skew"] = L * 2 * (h * d) * W * S * S
    # head: projector (2 matmuls H->H) over label+text slots is negligible vs
    # the encoder; count the two projector matmuls over all tokens as an upper
    # bound of its batched form
    c.flops["head"] = 2 * 2 * M * H * H

    # --- HBM bytes (first-order) ---
    c.hbm_bytes["weights"] = L * (4 * H * H + 2 * H * I) * wbytes
    # residual stream: read+write per fused block, ~4 passes per layer
    c.hbm_bytes["activations"] = L * 4 * 2 * M * H * act
    if bb.relative_attention and S <= _TABLE_SKEW_MAX_SEQ:
        # [B,h,S,S] score tensors: scores write, softmax r+w, probs read (~4x)
        c.hbm_bytes["score_tensors"] = L * 4 * B * h * S * S * act
        # [h,d,S,S] table write + read by the bias einsum
        c.hbm_bytes["pos_tables"] = L * 2 * h * d * S * S * act
    # fused kernel at 512: q/k/v/o + windows only
    elif bb.relative_attention:
        c.hbm_bytes["attn_io"] = L * 4 * B * h * S * d * act
    c.hbm_bytes["embeddings"] = M * H * act  # gathered rows
    return c


def speed_of_light(
    cfg: GLiClassConfig,
    batch: int,
    seq: int,
    step_seconds: float,
    chip: str = "v5e",
    quant_mode: str = "int8",
) -> dict:
    """Measured step time -> achieved TFLOP/s, MXU/HBM utilization, and the
    speed-of-light step time (max of compute-bound and memory-bound minima)."""
    peaks = CHIP_PEAKS[chip]
    cost = gliclass_step_cost(cfg, batch, seq, quant_mode)
    tflops = cost.total_flops / step_seconds / 1e12
    gbps = cost.total_bytes / step_seconds / 1e9
    sol_s = max(
        cost.total_flops / (peaks["bf16_tflops"] * 1e12),
        cost.total_bytes / (peaks["hbm_gbps"] * 1e9),
    )
    return {
        "chip": chip,
        "step_ms": step_seconds * 1e3,
        "tflops": round(tflops, 1),
        "mxu_util": round(tflops / peaks["bf16_tflops"], 3),
        "hbm_gbps": round(gbps, 1),
        "hbm_util": round(gbps / peaks["hbm_gbps"], 3),
        "sol_ms": round(sol_s * 1e3, 2),
        "sol_frac": round(sol_s / step_seconds, 3),
        "flops_breakdown": {k: round(v / 1e9, 1) for k, v in cost.flops.items()},
    }
