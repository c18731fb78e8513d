"""Scheduler + pipeline tests: bucketed batch planning, async pipelined
execution, continuous-batching streaming scheduler (every request answered
exactly once — SURVEY §4 scheduler property tests), end-to-end job parity."""

import threading

import numpy as np
import pytest

import jax

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
from gliclass.c_tpu.data import parse_job
from gliclass.c_tpu.engine import InferenceEngine
from gliclass.c_tpu.models.gliclass import init_gliclass_params
from gliclass.c_tpu.parallel.scheduler import (
    StreamingScheduler,
    plan_batches,
    run_planned,
)
from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline
from gliclass.c_tpu.prompting import pack_prompt, pack_prompts
from gliclass.c_tpu.tokenization import PromptTokenizer

RT = RuntimeConfig(
    batch_size=4,
    max_length=64,
    compute_dtype="float32",
    seq_buckets=(16, 32, 64),
    label_buckets=(2, 4, 8),
)


@pytest.fixture(scope="module")
def setup(tiny_tokenizer_file):
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True, position_biased_input=False,
    )
    cfg = GLiClassConfig(
        hidden_size=32, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )
    params = init_gliclass_params(jax.random.key(0), cfg)
    engine = InferenceEngine(cfg, params, RT)
    return tok, cfg, engine


def test_plan_batches_bucketing(setup):
    tok, cfg, engine = setup
    texts = ["short", "the quick brown fox jumps over the lazy dog " * 2] * 3
    labels = [["a", "b"], ["c", "d", "e", "f", "g"]] * 3
    prompts = [
        pack_prompt(t, l, True) for t, l in zip(texts, labels)
    ]
    planned = plan_batches(tok, prompts, [len(l) for l in labels], RT)
    # every request appears exactly once across batches
    seen = sorted(i for pb in planned for i in pb.indices)
    assert seen == list(range(6))
    # batches respect batch_size and bucket shapes
    for pb in planned:
        assert len(pb.indices) <= RT.batch_size
        assert pb.batch.seq_length in RT.seq_buckets
        assert pb.max_labels in RT.label_buckets


def test_run_planned_matches_direct(setup):
    tok, cfg, engine = setup
    texts = [f"fox number {i} " + "jumps " * (i % 5) for i in range(11)]
    labels = [["science", "sports", "format"]]
    prompts = pack_prompts(texts, labels, True, True)
    planned = plan_batches(tok, prompts, [3] * 11, RT)
    probs = run_planned(engine, planned, 11, 3)

    # direct single-batch reference (pad everything to one bucket)
    enc = tok.encode_batch(prompts, max_length=64, pad_to=64)
    ref = engine.run(enc, max_labels=4)[:, :3]
    np.testing.assert_allclose(probs, ref, atol=1e-5, rtol=1e-5)


def test_pipeline_call_api(setup):
    tok, cfg, engine = setup
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)
    results = pipe(
        ["the quick brown fox", "why are you running"],
        ["science", "sports"],
        classification_type="single-label",
    )
    assert len(results) == 2
    for r in results:
        assert len(r.decisions) == 1
        assert r.decisions[0].label in ("science", "sports")


def test_pipeline_job_contract(setup):
    tok, cfg, engine = setup
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)
    job = parse_job(
        {
            "texts": ["the quick brown fox", "why are you running", "support ukraine"],
            "labels": [["science", "sports"], ["question", "statement", "animal"], ["call to action"]],
            "same_labels": False,
            "classification_type": "multi-label",
        }
    )
    out = pipe.classify_job(job)
    assert out.probs.shape == (3, 3)
    # per-text invalid slots are zero
    assert out.probs[0, 2:].max() == 0.0
    assert out.probs[2, 1:].max() == 0.0
    assert "Text_0:" in out.report and "Text_2:" in out.report
    assert len(out.to_json()) == 3


class _FaultyEngine:
    """Wraps a real engine; fails run_async the first ``fail_times`` times a
    batch of the given seq bucket is dispatched (transient-device-fault
    injection for the job-level retry contract, SURVEY §5)."""

    def __init__(self, engine, fail_seq: int, fail_times: int):
        self._engine = engine
        self.fail_seq = fail_seq
        self.remaining = fail_times
        self.cfg = engine.cfg
        self.runtime = engine.runtime

    def run_async(self, batch, max_labels):
        if batch.seq_length == self.fail_seq and self.remaining > 0:
            self.remaining -= 1
            raise RuntimeError("injected device fault")
        return self._engine.run_async(batch, max_labels)

    def stack_batches(self, batches):
        return self._engine.stack_batches(batches)

    def run_stacked_async(self, ids, mask, max_labels):
        if ids.shape[2] == self.fail_seq and self.remaining > 0:
            self.remaining -= 1
            raise RuntimeError("injected device fault")
        return self._engine.run_stacked_async(ids, mask, max_labels)

    def run(self, batch, max_labels):
        dev, n = self.run_async(batch, max_labels)
        return np.asarray(dev)[:n]


def test_job_level_retry_transient_fault(setup):
    """A fault that clears on retry costs nothing: full results, no failures."""
    tok, cfg, engine = setup
    texts = [f"fox number {i} " + "jumps " * (i % 5) for i in range(11)]
    prompts = pack_prompts(texts, [["science", "sports", "format"]], True, True)
    planned = plan_batches(tok, prompts, [3] * 11, RT)
    ref = run_planned(engine, planned, 11, 3)

    faulty = _FaultyEngine(engine, fail_seq=planned[0].batch.seq_length, fail_times=1)
    failures = []
    probs = run_planned(faulty, planned, 11, 3, failures=failures)
    assert failures == []
    np.testing.assert_allclose(probs, ref, atol=1e-5, rtol=1e-5)


def test_job_level_retry_persistent_fault_isolates_batch(setup):
    """A persistent fault fails ONLY its batch's texts: one retry happened,
    the rest of the job is valid, and classify_job reports it structurally."""
    tok, cfg, engine = setup
    texts = ["short", "the quick brown fox jumps over the lazy dog " * 2] * 3
    labels = [["a", "b"], ["c", "d", "e", "f", "g"]] * 3
    prompts = [pack_prompt(t, l, True) for t, l in zip(texts, labels)]
    planned = plan_batches(tok, prompts, [len(l) for l in labels], RT)
    assert len(planned) >= 2
    fail_seq = planned[0].batch.seq_length
    ref = run_planned(engine, planned, 6, 5)

    faulty = _FaultyEngine(engine, fail_seq=fail_seq, fail_times=10**9)
    failures = []
    probs = run_planned(faulty, planned, 6, 5, failures=failures)
    failed = {i for f in failures for i in f.indices}
    expected_failed = {
        i for pb in planned if pb.batch.seq_length == fail_seq for i in pb.indices
    }
    assert failed == expected_failed and failed
    for f in failures:
        assert "injected device fault" in f.error and "retry" in f.error
    ok = sorted(set(range(6)) - failed)
    np.testing.assert_allclose(probs[ok], ref[ok], atol=1e-5, rtol=1e-5)
    assert probs[sorted(failed)].max() == 0.0

    # end-to-end: classify_job surfaces the failures; json rows carry errors
    pipe = ZeroShotClassificationPipeline(faulty, tok, RT)
    job = parse_job(
        {
            "texts": texts,
            "labels": labels,
            "same_labels": False,
            "classification_type": "multi-label",
        }
    )
    out = pipe.classify_job(job)
    assert out.failed_indices == expected_failed
    rows = out.to_json()
    for r in rows:
        assert ("error" in r) == (r["text_index"] in expected_failed)

    # without a failure channel the second error propagates (fail-fast)
    with pytest.raises(RuntimeError, match="injected device fault"):
        run_planned(faulty, planned, 6, 5)


def test_streaming_scheduler_exactly_once(setup):
    tok, cfg, engine = setup
    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=10.0)
    try:
        texts = [f"the quick brown fox {i}" for i in range(20)]
        labels = [["science", "sports", "format"], ["question"], ["a", "b", "c", "d", "e"]]
        futures = []
        def submit_range(lo, hi):
            for i in range(lo, hi):
                futures.append(
                    (i, sched.submit(texts[i], labels[i % 3], True))
                )
        threads = [
            threading.Thread(target=submit_range, args=(0, 10)),
            threading.Thread(target=submit_range, args=(10, 20)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(futures) == 20
        for i, f in futures:
            probs = f.result(timeout=120)
            assert probs.shape == (len(labels[i % 3]),)
            assert np.isfinite(probs).all()

        # cross-check one request against the batch pipeline
        pipe = ZeroShotClassificationPipeline(engine, tok, RT)
        ref = pipe.predict_probs([texts[0]], [labels[0]], True)[0]
        got = [f for i, f in futures if i == 0][0].result()
        np.testing.assert_allclose(got, ref[: len(labels[0])], atol=1e-5)
    finally:
        sched.close()


def test_streaming_scheduler_error_isolation(setup):
    """A persistently failing batch must fail its futures (after its one
    retry), not kill the loop; a transient fault is absorbed by the retry."""
    tok, cfg, engine = setup

    class Boom(Exception):
        pass

    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=1.0)
    orig_async, orig_run = sched.engine.run_async, sched.engine.run
    try:
        broken = {"on": True}

        def flaky_async(batch, max_labels):
            if broken["on"]:
                raise Boom("injected")
            return orig_async(batch, max_labels)

        def flaky_run(batch, max_labels):
            if broken["on"]:
                raise Boom("injected")
            return orig_run(batch, max_labels)

        sched.engine.run_async = flaky_async
        sched.engine.run = flaky_run  # retry path must fail too (persistent)
        f1 = sched.submit("the quick brown fox", ["science"], True)
        with pytest.raises(Exception, match="injected"):
            f1.result(timeout=120)
        broken["on"] = False
        f2 = sched.submit("why are you running", ["question"], True)
        assert f2.result(timeout=120).shape == (1,)

        # transient fault: fails once at dispatch, retry succeeds -> result
        calls = {"n": 0}

        def once(batch, max_labels):
            calls["n"] += 1
            if calls["n"] == 1:
                raise Boom("transient")
            return orig_async(batch, max_labels)

        sched.engine.run_async = once
        f3 = sched.submit("support ukraine", ["call to action"], True)
        assert f3.result(timeout=120).shape == (1,)
    finally:
        sched.engine.run_async = orig_async
        sched.engine.run = orig_run
        sched.close()


def test_row_bucketing_bounds_executable_variety(setup):
    """Serving compile-storm guard: micro-batches of different row counts pad
    to power-of-two row buckets, so they REUSE one traced executable instead
    of compiling one per arrived size (measured as a 19 req/s collapse on the
    tunneled chip before the fix)."""
    tok, cfg, engine = setup
    engine = InferenceEngine(cfg, engine.params, RT)  # fresh step cache
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)
    labels = [["science", "sports", "format"]]

    def run_n(n):
        return pipe.predict_probs([f"text {i} fox" for i in range(n)], labels, True)

    p3 = run_n(3)
    run_n(4)  # same 4-row bucket as n=3
    # both padded to the 4-row bucket -> exactly one traced shape per step
    step_keys = [k for k in engine._steps if not isinstance(k[0], str)]
    assert step_keys, engine._steps.keys()
    for k in step_keys:
        assert engine._steps[k]._cache_size() == 1, (
            k, engine._steps[k]._cache_size(),
        )
    assert engine._row_bucket(3) == 4 and engine._row_bucket(4) == 4
    # row padding is semantics-free
    np.testing.assert_array_equal(p3, run_n(3))


def test_pipelined_tokenize_producer_shutdown(setup, monkeypatch):
    """Opt-in producer-thread tokenize (GLICLASS_TPU_PIPELINE_TOKENIZE=1):
    when the consumer loop exits early (persistent dispatch failure with no
    failure channel), the producer must observe the stop flag and terminate
    instead of blocking forever on the bounded queue (ADVICE r3: leaked
    daemon thread + pinned encoded chunks per failed job)."""
    import time

    from gliclass.c_tpu.parallel.scheduler import plan_and_run_overlapped

    tok, cfg, engine = setup
    monkeypatch.setenv("GLICLASS_TPU_PIPELINE_TOKENIZE", "1")

    class Boom(RuntimeError):
        pass

    def fail(*a, **k):
        raise Boom("dispatch down")

    eng = InferenceEngine(cfg, engine.params, RT)
    eng.run_async = fail
    eng.run = fail
    prompts = [pack_prompt(f"text {i} fox", ["a", "b"], True) for i in range(64)]
    before = set(threading.enumerate())
    with pytest.raises(Boom):
        plan_and_run_overlapped(
            eng, tok, prompts, [2] * 64, RT, 64, 2, chunk=2, failures=None
        )
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        leaked = [t for t in threading.enumerate() if t not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"

    # and the happy path still matches the barrier plan under the flag
    good = InferenceEngine(cfg, engine.params, RT)
    streamed = plan_and_run_overlapped(
        good, tok, prompts, [2] * 64, RT, 64, 2, chunk=8
    )
    planned = plan_batches(tok, prompts, [2] * 64, RT)
    np.testing.assert_allclose(
        streamed, run_planned(good, planned, 64, 2), atol=1e-6
    )


def test_streamed_plan_stacks_filled_batches(setup):
    """The streamed plan folds filled same-shape batches into stacked
    launches with the SELF-CLOCKING policy (dispatch_ready launches ALL
    currently-ready batches of a shape key as one stack, capped at
    _MAX_STACK) — r3 paid one fresh-input launch per batch on the default
    path while the barrier plan already stacked (VERDICT r3 task 1).
    Results must equal the barrier plan exactly, and the stacked
    executables must actually engage."""
    from gliclass.c_tpu.parallel.scheduler import plan_and_run_overlapped
    from gliclass.c_tpu.utils.metrics import StageTimer

    tok, cfg, engine = setup
    eng = InferenceEngine(cfg, engine.params, RT)  # fresh step cache
    n = 40  # bs=4, chunk=32 -> 8 filled same-shape batches in one chunk: a
    # burst that dispatch_ready must fold into stacked launches
    prompts = [pack_prompt(f"science fox {i}", ["a", "b"], True) for i in range(n)]
    timer = StageTimer()
    streamed = plan_and_run_overlapped(
        eng, tok, prompts, [2] * n, RT, n, 2, chunk=32, timer=timer
    )
    # stacked steps were traced and used (stack depth = whatever was ready
    # when each chunk's dispatch_ready fired; > 1 for this burst)
    stack_keys = [k for k in eng._steps if isinstance(k[0], str) and k[0] == "stack"]
    assert stack_keys, f"no stacked executables engaged: {list(eng._steps)}"
    # host attribution recorded for the breakdown (h_* nested stages)
    assert {"h_tokenize", "h_dispatch", "h_drain"} <= set(timer.stages)
    planned = plan_batches(tok, prompts, [2] * n, RT)
    np.testing.assert_allclose(
        streamed, run_planned(eng, planned, n, 2), atol=1e-6
    )


def test_streamed_plan_stack_opt_out(setup, monkeypatch):
    """GLICLASS_TPU_STREAM_STACK=0 restores one-launch-per-batch (A/B knob)."""
    from gliclass.c_tpu.parallel.scheduler import plan_and_run_overlapped

    tok, cfg, engine = setup
    monkeypatch.setenv("GLICLASS_TPU_STREAM_STACK", "0")
    eng = InferenceEngine(cfg, engine.params, RT)
    n = 24
    prompts = [pack_prompt(f"science fox {i}", ["a", "b"], True) for i in range(n)]
    streamed = plan_and_run_overlapped(eng, tok, prompts, [2] * n, RT, n, 2, chunk=8)
    assert not any(
        isinstance(k[0], str) and k[0] == "stack" for k in eng._steps
    )
    planned = plan_batches(tok, prompts, [2] * n, RT)
    np.testing.assert_allclose(
        streamed, run_planned(eng, planned, n, 2), atol=1e-6
    )


def test_streaming_drain_failure_retried_in_drainer(setup):
    """A launch whose RESULT TRANSFER fails (drain-side fault, hit on the
    drainer thread since rounds pipelined) gets the standard one-retry:
    _drain_in_flight re-runs the batch synchronously; the request still
    resolves with correct probabilities."""
    import numpy as np

    from gliclass.c_tpu.parallel.scheduler import StreamingScheduler

    tok, cfg, engine = setup
    eng = InferenceEngine(cfg, engine.params, RT)
    sched = StreamingScheduler(eng, tok, RT, max_wait_ms=5.0)
    orig_async = eng.run_async

    class PoisonDev:
        """Device-array stand-in whose transfer raises once."""

        def __init__(self, dev):
            self.dev = dev
            self.shape = dev.shape
            self.ndim = dev.ndim

        def __array__(self, *a, **k):
            raise RuntimeError("transfer failed")

    calls = {"n": 0}

    def poisoned(batch, max_labels):
        dev, n = orig_async(batch, max_labels)
        calls["n"] += 1
        if calls["n"] == 1:
            return PoisonDev(dev), n
        return dev, n

    try:
        eng.run_async = poisoned
        f = sched.submit("science fox runs", ["science", "sports"], True)
        probs = f.result(timeout=120)
        assert probs.shape == (2,)
        assert np.all((probs >= 0) & (probs <= 1))
        # sanity: matches a clean engine run
        clean = InferenceEngine(cfg, engine.params, RT)
        pipe = ZeroShotClassificationPipeline(clean, tok, RT)
        ref = pipe.predict_probs(
            ["science fox runs"], [["science", "sports"]], True
        )
        np.testing.assert_allclose(probs, ref[0, :2], atol=1e-6)
    finally:
        eng.run_async = orig_async
        sched.close()


def test_row_bucket_clamps_at_batch_size(setup):
    """A FULL batch at a non-power-of-two batch_size must never pad past
    itself: with batch_size=96 the hot path would otherwise pad 96->128 and
    waste ~33% device compute on every full step (ADVICE r3). Power-of-two
    buckets apply only BELOW batch_size; sizes at/above it stay exact."""
    import dataclasses

    tok, cfg, engine = setup
    eng96 = InferenceEngine(
        cfg, engine.params, dataclasses.replace(RT, batch_size=96)
    )
    assert eng96._row_bucket(96) == 96  # full batch: no pad
    assert eng96._row_bucket(70) == 96  # pow2 would be 128 -> clamped
    assert eng96._row_bucket(33) == 64  # pow2 below batch_size kept
    assert eng96._row_bucket(97) == 97  # above batch_size: exact (dp=1)
    eng4 = InferenceEngine(cfg, engine.params, RT)  # batch_size=4
    assert [eng4._row_bucket(n) for n in (1, 2, 3, 4, 5)] == [1, 2, 4, 4, 5]


def test_pipeline_warns_beyond_max_num_classes(setup):
    """The batch path WARNS when a label list exceeds the bundle's trained
    max_num_classes (the serving path hard-errors, serving.py; the
    reference never checks — parity with a visible quality signal)."""
    import dataclasses
    import warnings

    tok, cfg, engine = setup
    cfg2 = dataclasses.replace(cfg, max_num_classes=2)
    eng = InferenceEngine(cfg2, engine.params, RT)
    pipe = ZeroShotClassificationPipeline(eng, tok, RT)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe(["the quick brown fox"], ["science", "sports", "format"])
    assert any("max_num_classes" in str(x.message) for x in w)
    # at or below capacity: silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe(["the quick brown fox"], ["science", "sports"])
    assert not any("max_num_classes" in str(x.message) for x in w)


def test_same_labels_affix_fast_path_matches_barrier_plan(setup):
    """The same-labels AffixEncoder fast path (label block encoded once per
    job, composed per text) must produce EXACTLY the barrier plan's probs —
    ids are verified identical upstream (test_host_pipeline), this covers
    the full pipeline wiring including the overlapped tokenize stream."""
    tok, cfg, engine = setup
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)
    texts = [f"fox number {i} " + "jumps " * (i % 5) for i in range(40)]
    labels = ["science", "sports", "format"]
    assert RT.overlap_enabled()
    streamed = pipe.predict_probs(texts, [labels], same_labels=True)
    prompts = pack_prompts(texts, [labels], True, True)
    planned = plan_batches(tok, prompts, [3] * len(texts), RT)
    ref = run_planned(engine, planned, len(texts), 3)
    np.testing.assert_allclose(streamed, ref, atol=1e-6)
