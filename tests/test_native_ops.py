"""Parity tests: native C++ host ops vs the canonical Python implementations.

The native library is a build artifact (make -C native); tests build it on
demand if the toolchain is present and skip otherwise.
"""

import os
import subprocess

import numpy as np
import pytest

from gliclass.c_tpu import native_ops
from gliclass.c_tpu.postprocess import decide_batch
from gliclass.c_tpu.prompting import pack_prompt, pack_prompts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def ensure_lib():
    if not native_ops.available():
        try:
            subprocess.run(
                ["make", "-C", os.path.join(REPO, "native")],
                check=True, capture_output=True,
            )
        except Exception:
            pytest.skip("native toolchain unavailable")
        native_ops._TRIED = False  # re-probe after build
        if not native_ops.available():
            pytest.skip("native library failed to load")


def test_pack_parity_basic():
    texts = [f"Text number {i} with CAPS and Ünïcode" for i in range(10)]
    labels = [["Science", "SPORTS", "çaT"]]
    ref = [pack_prompt(t, labels[0], True) for t in texts]
    out = native_ops.pack_prompts_native(texts, labels, True, True)
    assert out == ref


def test_pack_parity_per_text_prompt_last():
    texts = ["alpha", "beta", "gamma"]
    labels = [["A"], ["B", "C"], []]
    ref = [pack_prompt(t, l, False) for t, l in zip(texts, labels)]
    out = native_ops.pack_prompts_native(texts, labels, False, False)
    assert out == ref


def test_pack_parity_large_threaded():
    rng = np.random.default_rng(0)
    texts = [
        " ".join(rng.choice(["The", "quick", "BROWN", "Fox"], size=20))
        for _ in range(2000)
    ]
    labels = [["LabelOne", "LABELTWO", "three"]]
    ref = [pack_prompt(t, labels[0], True) for t in texts]
    out = native_ops.pack_prompts_native(texts, labels, True, True, n_threads=4)
    assert out == ref


def test_pack_prompts_dispatches_native():
    texts = [f"t{i}" for i in range(300)]
    labels = [["x"]]
    out = pack_prompts(texts, labels, True, True)
    assert out == [f"<<LABEL>>x<<SEP>>t{i}" for i in range(300)]


def test_decide_multilabel_parity():
    rng = np.random.default_rng(1)
    probs = rng.random((64, 8)).astype(np.float32)
    nv = rng.integers(0, 9, size=64)
    rows, cols, scores = native_ops.decide_multilabel_native(probs, 0.5, nv)
    # reference: numpy decide_batch
    labels = [[f"l{j}" for j in range(8)]]
    res = decide_batch(probs, [""] * 64, labels, True, "multi-label", 0.5, nv)
    ref_pairs = [
        (r.text_index, d.index, np.float32(d.score))
        for r in res
        for d in r.decisions
    ]
    got_pairs = list(zip(rows.tolist(), cols.tolist(), scores))
    assert [(a, b) for a, b, _ in ref_pairs] == [(a, b) for a, b, _ in got_pairs]
    np.testing.assert_allclose(
        [s for *_, s in ref_pairs], [s for *_, s in got_pairs], rtol=1e-6
    )


def test_decide_single_parity():
    rng = np.random.default_rng(2)
    probs = rng.random((32, 5)).astype(np.float32)
    probs[3] = 0.0  # all-zero row -> idx -1 (reference max_idx=-1 case)
    nv = np.full(32, 5, dtype=np.int64)
    nv[4] = 2
    idx, scores = native_ops.decide_single_native(probs, nv)
    labels = [[f"l{j}" for j in range(5)]]
    res = decide_batch(probs, [""] * 32, labels, True, "single-label", 0.5, nv)
    for i, r in enumerate(res):
        assert idx[i] == r.decisions[0].index
        np.testing.assert_allclose(scores[i], r.decisions[0].score, rtol=1e-6)


def test_pad_batch_parity():
    rng = np.random.default_rng(3)
    rows = [rng.integers(1, 100, size=int(rng.integers(1, 20))) for _ in range(50)]
    flat = np.concatenate(rows).astype(np.int32)
    offs = np.zeros(51, dtype=np.int64)
    offs[1:] = np.cumsum([len(r) for r in rows])
    ids, mask = native_ops.pad_batch_native(flat, offs, target=12, pad_id=0)
    for i, r in enumerate(rows):
        L = min(len(r), 12)
        np.testing.assert_array_equal(ids[i, :L], r[:L])
        assert (ids[i, L:] == 0).all()
        assert mask[i].sum() == L


# ---------------------------------------------------------------------------
# Hot-path wiring: the native kernels must be REACHED from the public APIs
# (decide_batch / encode_batch), not only callable in isolation, and the
# two paths must agree exactly.
# ---------------------------------------------------------------------------
def test_decide_batch_native_vs_numpy_identical():
    import numpy as np

    from gliclass.c_tpu import native_ops
    from gliclass.c_tpu.postprocess import decide_batch

    if not native_ops.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    B, C = 48, 8  # under _NATIVE_DECIDE_MAX_CELLS -> native path engages
    probs = rng.random((B, C)).astype(np.float32)
    probs[0] = 0.0  # all-zero row -> idx -1 / [Unknown] in single-label
    texts = [f"t{i}" for i in range(B)]
    labels = [[f"l{j}" for j in range(C - 1)]]  # fewer labels than cols -> [Unknown]
    nv = [C] * B
    for ctype in ("multi-label", "single-label"):
        a = decide_batch(probs, texts, labels, True, ctype, 0.5, num_valid=nv, use_native=True)
        b = decide_batch(probs, texts, labels, True, ctype, 0.5, num_valid=nv, use_native=False)
        assert [r.to_dict() for r in a] == [r.to_dict() for r in b]


def test_encode_batch_native_fill_matches_loop(tiny_tokenizer_file, monkeypatch):
    import numpy as np

    import gliclass.c_tpu.tokenization as T
    from gliclass.c_tpu import native_ops
    from gliclass.c_tpu.tokenization import PromptTokenizer

    if not native_ops.available():
        pytest.skip("native library not built")
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    prompts = [f"prompt number {i} with words {'x' * (i % 37)}" for i in range(64)]
    # force the native fill on this small batch, then compare to the loop
    monkeypatch.setattr(T, "_NATIVE_PAD_MIN_ROWS", 1)
    a = tok.encode_batch(prompts, max_length=32, pad_to=32)
    monkeypatch.setattr(T, "_NATIVE_PAD_MIN_ROWS", 1 << 30)
    b = tok.encode_batch(prompts, max_length=32, pad_to=32)
    assert np.array_equal(a.input_ids, b.input_ids)
    assert np.array_equal(a.attention_mask, b.attention_mask)
    assert np.array_equal(a.lengths, b.lengths)
