"""Prompt packing: text + candidate labels -> one model input string.

Exact semantics of reference src/preprocessor.c:67-111:
  * each label is prefixed with ``<<LABEL>>``
  * labels are lowercased byte-wise with C ``tolower`` — i.e. ASCII-only
    lowercasing, non-ASCII bytes untouched (reference src/preprocessor.c:88-93)
  * ``prompt_first=True``:  <<LABEL>>l1<<LABEL>>l2...<<SEP>>text
  * ``prompt_first=False``: text<<LABEL>>l1<<LABEL>>l2...<<SEP>>

A native C++ fast path (see native/host_ops.cpp) is used for large jobs when
built; this module is the canonical-semantics implementation and the fallback.
"""

from __future__ import annotations

from typing import Iterable, Sequence

LABEL_TAG = "<<LABEL>>"
SEP_TAG = "<<SEP>>"

# C tolower() in the "C" locale lowercases only ASCII A-Z; Python str.lower()
# would also lowercase non-ASCII (É->é), diverging from the reference. Build an
# ASCII-only translation table for parity (reference src/preprocessor.c:88-93).
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def ascii_lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


def pack_prompt(text: str, labels: Sequence[str], prompt_first: bool) -> str:
    """Build the packed prompt for one text (reference src/preprocessor.c:67-111)."""
    label_block = "".join(LABEL_TAG + ascii_lower(l) for l in labels)
    if prompt_first:
        return f"{label_block}{SEP_TAG}{text}"
    return f"{text}{label_block}{SEP_TAG}"


def pack_prompts(
    texts: Sequence[str],
    labels: Sequence[Sequence[str]],
    same_labels: bool,
    prompt_first: bool,
) -> list[str]:
    """Batch prompt packing (reference src/preprocessor.c:23-43 prepare_inputs).

    ``labels`` indexing matches the reference: ``labels[0]`` when ``same_labels``
    else ``labels[i]`` (reference src/preprocessor.c:33-38).
    """
    if len(texts) >= 256:
        # Large jobs: threaded C++ packer (native/host_ops.cpp), exact same
        # output bytes; falls back silently when the library isn't built.
        from . import native_ops

        packed = native_ops.pack_prompts_native(
            texts, labels, same_labels, prompt_first
        )
        if packed is not None:
            return packed
    out = []
    for i, text in enumerate(texts):
        ls = labels[0] if same_labels else labels[i]
        out.append(pack_prompt(text, ls, prompt_first))
    return out
