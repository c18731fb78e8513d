"""Classification-job ingest: the reference JSON schema, verbatim.

Replaces reference src/read_data.c (cJSON-based parse of {texts, labels,
same_labels, classification_type}; reference src/read_data.c:45-143) with a typed
Python loader. The schema is kept exactly (reference Readme.md:121-150):

    {"texts": [...], "labels": [[...]] | [[...], ...],
     "same_labels": bool, "classification_type": "multi-label"|"single-label"}

When ``same_labels`` is true, ``labels`` holds a single shared label list
(reference src/read_data.c:78-105); otherwise one list per text with a count
check against ``texts`` (reference src/read_data.c:106-143).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Sequence


class JobParseError(ValueError):
    pass


@dataclass(frozen=True)
class ClassificationJob:
    texts: tuple[str, ...]
    labels: tuple[tuple[str, ...], ...]  # one entry per text (expanded if shared)
    same_labels: bool
    classification_type: str  # "multi-label" | "single-label"

    @property
    def num_texts(self) -> int:
        return len(self.texts)

    def labels_for(self, i: int) -> tuple[str, ...]:
        """Label set for text i (reference src/preprocessor.c:33-38 indexing)."""
        return self.labels[0] if self.same_labels else self.labels[i]


def parse_job(obj: dict[str, Any]) -> ClassificationJob:
    """Parse an already-decoded job dict. Validation mirrors read_data.c."""
    if not isinstance(obj, dict):
        raise JobParseError("job must be a JSON object")
    texts = obj.get("texts")
    if not isinstance(texts, list) or not all(isinstance(t, str) for t in texts):
        raise JobParseError("'texts' must be a list of strings")
    if len(texts) == 0:
        raise JobParseError("'texts' must be non-empty")

    ctype = obj.get("classification_type")
    if ctype not in ("multi-label", "single-label"):
        # The reference parses any string and only rejects at postprocess time
        # (reference src/postprocessor.c:148-150); we fail fast at ingest.
        raise JobParseError(
            f"unsupported classification_type: {ctype!r} (expected 'multi-label' or 'single-label')"
        )

    same_labels = obj.get("same_labels")
    if not isinstance(same_labels, bool):
        raise JobParseError("'same_labels' must be a boolean")

    raw_labels = obj.get("labels")
    if not isinstance(raw_labels, list) or not raw_labels:
        raise JobParseError("'labels' must be a non-empty list of label lists")
    for ls in raw_labels:
        if not isinstance(ls, list) or not all(isinstance(l, str) for l in ls):
            raise JobParseError("'labels' entries must be lists of strings")

    if same_labels:
        # Shared label set: labels[0] applies to every text
        # (reference src/read_data.c:78-105).
        label_lists = (tuple(raw_labels[0]),)
    else:
        # Per-text label lists; count must match texts
        # (reference src/read_data.c:106-143).
        if len(raw_labels) != len(texts):
            raise JobParseError(
                f"labels count ({len(raw_labels)}) does not match texts count ({len(texts)})"
            )
        label_lists = tuple(tuple(ls) for ls in raw_labels)

    return ClassificationJob(
        texts=tuple(texts),
        labels=label_lists,
        same_labels=same_labels,
        classification_type=ctype,
    )


def load_job(path: str) -> ClassificationJob:
    """Read + parse a job file (reference src/read_data.c:14-28 read_file)."""
    with open(path, "r", encoding="utf-8") as f:
        try:
            obj = json.load(f)
        except json.JSONDecodeError as e:
            raise JobParseError(f"invalid JSON in {path}: {e}") from e
    return parse_job(obj)


def string_to_bool(s: str) -> bool:
    """Parse a prompt_first-style CLI flag (reference src/read_data.c:160-169)."""
    if s in ("true", "1", "True"):
        return True
    if s in ("false", "0", "False"):
        return False
    raise ValueError(f"invalid boolean value: {s!r} (expected true/false/1/0)")
