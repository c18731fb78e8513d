"""Evaluation metrics for the accuracy gate.

BASELINE.md gates the INT8 path at <=0.5% micro-F1 delta vs the fp32 reference
on GLiClass eval sets. This module computes micro/macro F1 over decision sets
and the delta between two prediction runs, so the gate is a one-call check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class F1Result:
    micro_f1: float
    macro_f1: float
    precision: float
    recall: float
    tp: int
    fp: int
    fn: int


def _to_sets(preds: Sequence[Sequence[int | str]]) -> list[set]:
    return [set(p) for p in preds]


def multilabel_f1(
    predictions: Sequence[Sequence[int | str]],
    references: Sequence[Sequence[int | str]],
) -> F1Result:
    """Micro/macro F1 over per-text label sets (ids or strings)."""
    if len(predictions) != len(references):
        raise ValueError("predictions and references must align")
    preds, refs = _to_sets(predictions), _to_sets(references)
    tp = fp = fn = 0
    per_text_f1 = []
    for p, r in zip(preds, refs):
        tpi = len(p & r)
        fpi = len(p - r)
        fni = len(r - p)
        tp, fp, fn = tp + tpi, fp + fpi, fn + fni
        denom = 2 * tpi + fpi + fni
        per_text_f1.append(2 * tpi / denom if denom else 1.0)
    prec = tp / (tp + fp) if (tp + fp) else 0.0
    rec = tp / (tp + fn) if (tp + fn) else 0.0
    micro = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    macro = sum(per_text_f1) / len(per_text_f1) if per_text_f1 else 0.0
    return F1Result(micro, macro, prec, rec, tp, fp, fn)


def f1_delta(
    predictions_a: Sequence[Sequence[int | str]],
    predictions_b: Sequence[Sequence[int | str]],
    references: Sequence[Sequence[int | str]],
) -> float:
    """|micro-F1(a) - micro-F1(b)| — the INT8-vs-fp32 accuracy gate."""
    fa = multilabel_f1(predictions_a, references)
    fb = multilabel_f1(predictions_b, references)
    return abs(fa.micro_f1 - fb.micro_f1)


def decisions_to_label_sets(results) -> list[list[str]]:
    """TextResult list -> per-text predicted label lists."""
    return [[d.label for d in r.decisions] for r in results]
