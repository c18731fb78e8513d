"""Decision head: per-label probabilities -> classification decisions + report.

Replaces reference src/postprocessor.c. Semantics preserved exactly:
  * probabilities are ``sigmoid(logit)`` for BOTH modes — single-label uses
    sigmoid + argmax, NOT softmax (reference src/postprocessor.c:121-127)
  * multi-label: a label is emitted iff ``prob > threshold`` (strict inequality,
    reference src/postprocessor.c:95)
  * single-label: strict-``>`` scan from index 0, so the FIRST maximum wins ties
    (reference src/postprocessor.c:122-127); threshold is ignored in this mode
  * an output column with no corresponding label yields the literal label string
    ``"[Unknown]"`` (reference src/postprocessor.c:107-111,141-144)

Divergences (documented): results are returned as structured objects (the
reference's only output is stdout, reference src/postprocessor.c:90-144); the
text index in the report is job-global, whereas the reference restarts numbering
per batch (an artifact of its batch-sliced printf loop,
reference src/parallel_processor.c:75-83).

The sigmoid itself runs in-graph on device (jax.nn.sigmoid in the jitted model
step); this module consumes probabilities on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

UNKNOWN_LABEL = "[Unknown]"

MULTI_LABEL = "multi-label"
SINGLE_LABEL = "single-label"


@dataclass(frozen=True)
class LabelScore:
    label: str
    score: float
    index: int


@dataclass(frozen=True)
class TextResult:
    text_index: int
    text: str
    decisions: tuple[LabelScore, ...]

    def to_dict(self) -> dict:
        return {
            "text_index": self.text_index,
            "text": self.text,
            "decisions": [
                {"label": d.label, "score": d.score, "index": d.index}
                for d in self.decisions
            ],
        }


def decide_row(
    probs: np.ndarray,
    labels: Sequence[str],
    classification_type: str,
    threshold: float,
    num_valid: int | None = None,
) -> tuple[LabelScore, ...]:
    """Decisions for one text.

    ``probs`` may be wider than ``labels`` (the reference handles this with the
    ``[Unknown]`` fallback; here it also arises from label-count bucketing).
    ``num_valid`` limits scoring to the first N columns — padded label slots
    beyond it are never considered (they do not exist in the reference, whose
    output width always equals the real label count).
    """
    probs = np.asarray(probs, dtype=np.float32)
    n = probs.shape[0] if num_valid is None else min(num_valid, probs.shape[0])
    if classification_type == MULTI_LABEL:
        out = []
        for j in range(n):
            p = float(probs[j])
            if p > threshold:  # strict > (reference src/postprocessor.c:95)
                label = labels[j] if j < len(labels) else UNKNOWN_LABEL
                out.append(LabelScore(label, p, j))
        return tuple(out)
    elif classification_type == SINGLE_LABEL:
        # Strict > scan starting from max_prob=0.0 / max_idx=-1
        # (reference src/postprocessor.c:118-127).
        max_prob, max_idx = 0.0, -1
        for j in range(n):
            p = float(probs[j])
            if p > max_prob:
                max_prob, max_idx = p, j
        label = (
            labels[max_idx] if 0 <= max_idx < len(labels) else UNKNOWN_LABEL
        )
        return (LabelScore(label, max_prob, max_idx),)
    else:
        raise ValueError(
            f"This type of classification is not supported: {classification_type!r}"
        )


# The C++ decision scan (native/host_ops.cpp gct_decide_*) avoids numpy's
# fixed per-op overhead, which dominates at serving micro-batch sizes:
# measured on the 2-CPU host (multi-label) native is 1.87x at B=64 C=16,
# 1.04x at 256x32, then 0.92-1.02x at 1024x64+ where the python LabelScore
# assembly dominates both paths. Use native below this cell count (the
# latency-sensitive serving batches), numpy above.
_NATIVE_DECIDE_MAX_CELLS = 16384


def decide_batch(
    probs: np.ndarray,
    texts: Sequence[str],
    labels: Sequence[Sequence[str]],
    same_labels: bool,
    classification_type: str,
    threshold: float,
    num_valid: Sequence[int] | None = None,
    text_offset: int = 0,
    use_native: bool = True,
) -> list[TextResult]:
    """Decisions for a [B, C] probability matrix.

    Label lookup mirrors the reference: ``labels[0]`` when ``same_labels`` else
    ``labels[i]`` (reference src/postprocessor.c:96-105,130-139).

    ``use_native``: allow the threaded C++ decision kernels for large
    matrices (plumbed from ``RuntimeConfig.use_native_host_ops``); the numpy
    path is the canonical-semantics fallback either way.
    """
    probs = np.asarray(probs, dtype=np.float32)
    B, C = probs.shape
    if classification_type not in (MULTI_LABEL, SINGLE_LABEL):
        raise ValueError(
            f"This type of classification is not supported: {classification_type!r}"
        )

    # Vectorized decision kernel (the reference's per-logit host loop,
    # src/postprocessor.c:88-147, is O(B*C) python here — numpy instead).
    if num_valid is not None:
        nv = np.asarray(num_valid, dtype=np.int64)
    else:
        nv = np.asarray(
            [len(labels[0] if same_labels else labels[i]) for i in range(B)],
            dtype=np.int64,
        )

    native = None
    if use_native and B * C <= _NATIVE_DECIDE_MAX_CELLS:
        from . import native_ops

        if native_ops.available():
            native = native_ops

    results = []
    if classification_type == MULTI_LABEL:
        if native is not None:
            out = native.decide_multilabel_native(probs, threshold, nv)
        else:
            out = None
        if out is not None:
            rows, cols, scores = out
            cols_l, scores_l = cols.tolist(), scores.tolist()
            rows_l = rows.tolist()
        else:
            # Columns the reference would scan: all C (it trusts the model
            # width); nv only masks engine-side padded slots.
            valid = np.arange(C)[None, :] < np.maximum(nv, 0)[:, None]
            passing = (probs > threshold) & valid  # strict > (postprocessor.c:95)
            rows, cols = np.nonzero(passing)
            rows_l, cols_l = rows.tolist(), cols.tolist()
            scores_l = probs[rows, cols].tolist()
        per_row: list[list[LabelScore]] = [[] for _ in range(B)]
        for r, c, p in zip(rows_l, cols_l, scores_l):
            ls = labels[0] if same_labels else labels[r]
            label = ls[c] if c < len(ls) else UNKNOWN_LABEL
            per_row[r].append(LabelScore(label, float(p), c))
        for i, text in enumerate(texts):
            results.append(TextResult(text_offset + i, text, tuple(per_row[i])))
    else:
        out = native.decide_single_native(probs, nv) if native is not None else None
        if out is not None:
            best, best_p = out
        else:
            valid = np.arange(C)[None, :] < np.maximum(nv, 0)[:, None]
            masked = np.where(valid, probs, 0.0)
            best = masked.argmax(axis=1)  # first max wins ties, like the strict scan
            best_p = masked[np.arange(B), best]
            # reference: max_prob starts at 0.0 -> all-zero rows keep max_idx=-1
            best = np.where(best_p > 0.0, best, -1)
        for i, text in enumerate(texts):
            ls = labels[0] if same_labels else labels[i]
            idx = int(best[i])
            label = ls[idx] if 0 <= idx < len(ls) else UNKNOWN_LABEL
            results.append(
                TextResult(
                    text_offset + i,
                    text,
                    (LabelScore(label, float(best_p[i]), idx),),
                )
            )
    return results


def format_report(results: Sequence[TextResult]) -> str:
    """Human-readable report, line format identical to the reference printf
    (reference src/postprocessor.c:90,108-110,118,142-144)."""
    lines = []
    for r in results:
        lines.append(f"Text_{r.text_index}: {r.text}:")
        for d in r.decisions:
            lines.append(
                f"  Text_{r.text_index} Label: {d.label}, Score: {d.score:.6f}"
            )
        lines.append("")
    return "\n".join(lines) + "\n" if lines else ""
