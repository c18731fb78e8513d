"""ctypes bindings for the native host-runtime library (native/host_ops.cpp).

Loads ``libgliclass_host.so`` when built (``make -C native``) and exposes the
native prompt packer, decision kernels and batch-padding fill. Every entry
point has a pure-Python/numpy fallback (the canonical-semantics implementations
in prompting.py / postprocess.py / tokenization.py), so the package works
without the native build; the native path is used automatically when present.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> str | None:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("GLICLASS_HOST_LIB", ""),
        os.path.join(here, "native", "libgliclass_host.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_lib():
    """The loaded native library, or None (disabled / not built)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GLICLASS_DISABLE_NATIVE") == "1":
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.gct_pack_prompts.restype = ctypes.c_int64
        lib.gct_pack_prompts.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.gct_decide_multilabel.restype = ctypes.c_int64
        lib.gct_decide_multilabel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.gct_decide_single.restype = None
        lib.gct_decide_single.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.gct_pad_batch.restype = None
        lib.gct_pad_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gct_free.restype = None
        lib.gct_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
def pack_prompts_native(
    texts: Sequence[str],
    labels: Sequence[Sequence[str]],
    same_labels: bool,
    prompt_first: bool,
    n_threads: int = 0,
) -> list[str] | None:
    """Native batch prompt packing; returns None if the library is unavailable
    (callers fall back to prompting.pack_prompts)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(texts)
    c_texts = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])

    flat_labels: list[bytes] = []
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i in range(n):
        ls = labels[0] if same_labels else labels[i]
        flat_labels.extend(l.encode("utf-8") for l in ls)
        offsets[i + 1] = len(flat_labels)
    c_labels = (ctypes.c_char_p * max(len(flat_labels), 1))(*flat_labels)

    out_buf = ctypes.c_char_p()
    out_offs = ctypes.POINTER(ctypes.c_int64)()
    threads = n_threads or min(8, os.cpu_count() or 1)
    rc = lib.gct_pack_prompts(
        c_texts, n, c_labels,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if prompt_first else 0, threads,
        ctypes.byref(out_buf), ctypes.byref(out_offs),
    )
    if rc != 0:
        return None
    try:
        total = out_offs[n]
        raw = ctypes.string_at(out_buf, total)
        offs = [out_offs[i] for i in range(n + 1)]
        return [raw[offs[i] : offs[i + 1] - 1].decode("utf-8") for i in range(n)]
    finally:
        lib.gct_free(out_buf)
        lib.gct_free(out_offs)


def decide_multilabel_native(
    probs: np.ndarray, threshold: float, num_valid: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """(rows, cols, scores) of strictly-above-threshold cells, or None."""
    lib = get_lib()
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    nv = np.ascontiguousarray(num_valid, dtype=np.int64)
    B, C = probs.shape
    rows_p = ctypes.POINTER(ctypes.c_int64)()
    cols_p = ctypes.POINTER(ctypes.c_int64)()
    sc_p = ctypes.POINTER(ctypes.c_float)()
    count = lib.gct_decide_multilabel(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), B, C,
        ctypes.c_float(threshold),
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(rows_p), ctypes.byref(cols_p), ctypes.byref(sc_p),
    )
    try:
        rows = np.ctypeslib.as_array(rows_p, shape=(count,)).copy()
        cols = np.ctypeslib.as_array(cols_p, shape=(count,)).copy()
        scores = np.ctypeslib.as_array(sc_p, shape=(count,)).copy()
    finally:
        lib.gct_free(rows_p)
        lib.gct_free(cols_p)
        lib.gct_free(sc_p)
    return rows, cols, scores


def decide_single_native(
    probs: np.ndarray, num_valid: np.ndarray
) -> tuple[np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    nv = np.ascontiguousarray(num_valid, dtype=np.int64)
    B, C = probs.shape
    idx = np.empty(B, dtype=np.int64)
    scores = np.empty(B, dtype=np.float32)
    lib.gct_decide_single(
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), B, C,
        nv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return idx, scores


def pad_batch_native(
    flat_ids: np.ndarray,
    row_offsets: np.ndarray,
    target: int,
    pad_id: int,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fill padded [n, target] (ids, mask) from flat rows, or None."""
    lib = get_lib()
    if lib is None:
        return None
    flat_ids = np.ascontiguousarray(flat_ids, dtype=np.int32)
    row_offsets = np.ascontiguousarray(row_offsets, dtype=np.int64)
    n = len(row_offsets) - 1
    ids = np.empty((n, target), dtype=np.int32)
    mask = np.empty((n, target), dtype=np.int32)
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.gct_pad_batch(
        flat_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        row_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, target, pad_id, threads,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return ids, mask
