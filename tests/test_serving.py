"""HTTP serving endpoint: request/response contract, concurrency, errors.

The server fronts the continuous-batching StreamingScheduler; responses must
match the offline pipeline's decisions exactly (same decide_batch semantics,
reference src/postprocessor.c:88-147)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
from gliclass.c_tpu.engine import InferenceEngine
from gliclass.c_tpu.models.gliclass import init_gliclass_params
from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline
from gliclass.c_tpu.serving import GLiClassServer
from gliclass.c_tpu.tokenization import PromptTokenizer

RT = RuntimeConfig(
    batch_size=4,
    max_length=64,
    compute_dtype="float32",
    seq_buckets=(16, 32, 64),
    label_buckets=(2, 4, 8),
)


@pytest.fixture(scope="module")
def server(tiny_tokenizer_file):
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True,
        position_biased_input=False,
    )
    cfg = GLiClassConfig(
        hidden_size=32, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )
    params = init_gliclass_params(jax.random.key(0), cfg)
    engine = InferenceEngine(cfg, params, RT)
    srv = GLiClassServer(engine, tok, RT, host="127.0.0.1", port=0)
    srv.start()
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)
    yield srv, pipe
    srv.close()


def _post(port, path, payload, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return json.loads(r.read())


def test_healthz(server):
    srv, _ = server
    assert _get(srv.port, "/healthz")["status"] == "ok"


def test_classify_matches_pipeline(server):
    srv, pipe = server
    texts = ["the quick brown fox", "open source model", "running dog races"]
    labels = ["science", "sports", "format", "question"]
    out = _post(srv.port, "/classify", {
        "texts": texts, "labels": labels,
        "classification_type": "multi-label", "threshold": 0.0,
    })
    ref = pipe(texts, labels, "multi-label", threshold=0.0)
    assert len(out["results"]) == len(texts)
    for got, want in zip(out["results"], ref):
        w = want.to_dict()
        assert got["text"] == w["text"]
        got_scores = {d["label"]: d["score"] for d in got["decisions"]}
        want_scores = {d["label"]: d["score"] for d in w["decisions"]}
        assert set(got_scores) == set(want_scores)
        for lbl in got_scores:
            np.testing.assert_allclose(got_scores[lbl], want_scores[lbl], atol=1e-5)


def test_single_text_and_single_label_mode(server):
    srv, _ = server
    out = _post(srv.port, "/classify", {
        "text": "the quick brown fox",
        "labels": ["science", "sports"],
        "classification_type": "single-label",
    })
    assert len(out["results"]) == 1
    # single-label: exactly one decision (argmax; reference postprocessor.c:116-147)
    assert len(out["results"][0]["decisions"]) == 1


def test_per_text_labels(server):
    srv, _ = server
    out = _post(srv.port, "/classify", {
        "texts": ["alpha beta", "gamma delta"],
        "labels": [["a", "b"], ["c", "d", "e"]],
        "threshold": 0.0,
    })
    assert [len(r["decisions"]) for r in out["results"]] == [2, 3]


def test_concurrent_requests_each_answered_once(server):
    srv, _ = server
    results = [None] * 8
    def worker(i):
        results[i] = _post(srv.port, "/classify", {
            "texts": [f"text number {i}"], "labels": ["a", "b", "c"],
            "threshold": 0.0,
        })
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    for i, r in enumerate(results):
        assert r is not None and len(r["results"]) == 1
        assert r["results"][0]["text"] == f"text number {i}"


def test_bad_requests(server):
    srv, _ = server
    for payload in (
        {"labels": ["a"]},                                  # no texts
        {"texts": ["x"], "labels": []},                     # empty labels
        {"texts": ["x", "y"], "labels": [["a"]]},           # count mismatch
        {"texts": ["x"], "labels": ["a"], "classification_type": "nope"},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv.port, "/classify", payload)
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())


def test_metrics(server):
    srv, _ = server
    m = _get(srv.port, "/metrics")
    assert m["requests"] > 0 and m["texts"] > 0 and m["errors"] >= 4
    # latency percentiles + queue depth (operability observability):
    # successful classifies above populated the latency ring
    lat = m["latency"]
    assert lat["count"] > 0
    assert 0 < lat["p50_ms"] <= lat["p95_ms"] <= lat["p99_ms"]
    assert m["queue_depth"] >= 0


def test_oversized_body_rejected_413(server):
    srv, _ = server
    from gliclass.c_tpu.serving import MAX_BODY_BYTES

    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/classify",
        data=b"x",
        headers={
            "Content-Type": "application/json",
            "Content-Length": str(MAX_BODY_BYTES + 1),
        },
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 413


def test_max_num_classes_enforced(server):
    srv, _ = server
    # the tiny bundle's config keeps the gliclass default max_num_classes=25
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv.port, "/classify", {
            "texts": ["x"], "labels": [f"label{i}" for i in range(26)],
        })
    assert e.value.code == 400
    assert "max_num_classes" in json.loads(e.value.read())["error"]


def _tiny_engine_and_tok(tiny_tokenizer_file):
    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True,
        position_biased_input=False,
    )
    cfg = GLiClassConfig(
        hidden_size=32, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )
    params = init_gliclass_params(jax.random.key(0), cfg)
    return InferenceEngine(cfg, params, RT), tok


def test_load_no_request_lost_or_doubled_under_pressure(tiny_tokenizer_file):
    """N threads x M requests against a server with a tiny bounded queue:
    every request gets exactly one terminal answer — 200 with its own text
    echoed back, or 429/503 shed — and none hangs."""
    engine, tok = _tiny_engine_and_tok(tiny_tokenizer_file)
    srv = GLiClassServer(
        engine, tok, RT, host="127.0.0.1", port=0, max_pending=8,
        result_timeout_s=60,
    )
    srv.start()
    N, M = 6, 5
    outcomes = {}
    lock = threading.Lock()

    def worker(t):
        for m in range(M):
            key = f"req {t} {m}"
            try:
                r = _post(srv.port, "/classify", {
                    "texts": [key], "labels": ["a", "b"], "threshold": 0.0,
                })
                ok = r["results"][0]["text"] == key and len(r["results"]) == 1
                code = 200 if ok else -1
            except urllib.error.HTTPError as e:
                code = e.code
            with lock:
                assert key not in outcomes, f"double answer for {key}"
                outcomes[key] = code

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(N)]
    [t.start() for t in threads]
    [t.join(timeout=300) for t in threads]
    assert not any(t.is_alive() for t in threads), "a request hung"
    # percentiles must MOVE under load (not just exist): the ring holds the
    # served requests and p95 >= p50 > 0. Read before close().
    m = _get(srv.port, "/metrics")
    srv.close()
    assert len(outcomes) == N * M
    assert all(c in (200, 429, 503) for c in outcomes.values()), outcomes
    assert sum(c == 200 for c in outcomes.values()) >= 1
    served = sum(c == 200 for c in outcomes.values())
    assert m["latency"]["count"] >= min(served, 1)
    if m["latency"]["count"]:
        assert m["latency"]["p95_ms"] >= m["latency"]["p50_ms"] > 0


def test_close_wakes_blocked_handlers_fast(tiny_tokenizer_file):
    """Scheduler close() must fail queued futures so a caller blocked on
    result() wakes promptly (ADVICE: in-flight requests used to hang until
    the 120 s timeout)."""
    import time

    from gliclass.c_tpu.parallel.scheduler import (
        SchedulerClosed,
        StreamingScheduler,
    )

    engine, tok = _tiny_engine_and_tok(tiny_tokenizer_file)
    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=2000.0)
    # first submit occupies the collect window; pile more behind it
    futs = [sched.submit(f"text {i}", ["a", "b"], True) for i in range(12)]
    t0 = time.monotonic()
    sched.close()
    for f in futs:
        try:
            f.result(timeout=30)  # either computed before close, or failed
        except SchedulerClosed:
            pass
    assert time.monotonic() - t0 < 30
    # post-close submits are refused outright
    with pytest.raises(SchedulerClosed):
        sched.submit("late", ["a"], True)


def test_metrics_percentiles_nearest_rank():
    """Small-sample percentiles use nearest-rank (ceil(p*n)-1): the p50 of
    two latencies is the SMALLER one, not the larger (ADVICE r4)."""
    from gliclass.c_tpu.serving import ServingMetrics

    m = ServingMetrics()
    m.record(texts=1, latency_s=0.010)
    m.record(texts=1, latency_s=0.100)
    lat = m.to_dict()["latency"]
    assert lat["count"] == 2
    assert lat["p50_ms"] == 10.0  # ceil(0.5*2)-1 = index 0
    assert lat["p99_ms"] == 100.0
    m.record(texts=1, latency_s=0.050)
    lat = m.to_dict()["latency"]
    assert lat["p50_ms"] == 50.0  # ceil(0.5*3)-1 = index 1 (true median)


def test_streaming_affix_groups_match_packed(tiny_tokenizer_file, monkeypatch):
    """The scheduler's per-label-set affix encode (r5) must produce the same
    results as the packed path for MIXED label sets in one round, including
    a group whose composition check fails (forced fallback)."""
    from gliclass.c_tpu.parallel.scheduler import StreamingScheduler

    engine, tok = _tiny_engine_and_tok(tiny_tokenizer_file)
    pipe = ZeroShotClassificationPipeline(engine, tok, RT)

    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=200.0)
    texts = [f"fox number {i} jumps" for i in range(12)]
    label_sets = [["science", "sports"], ["format", "tool", "question"]]
    futs = [
        sched.submit(t, label_sets[i % 2], True) for i, t in enumerate(texts)
    ]
    got = [f.result(timeout=60) for f in futs]
    # a fallback-forcing encoder must give identical results
    for enc in sched._affix_cache.values():
        assert enc.exact  # tiny tokenizer composes exactly
    sched.close()

    for i, t in enumerate(texts):
        ref = pipe([t], label_sets[i % 2])
        probs_ref = pipe.predict_probs([t], [label_sets[i % 2]], True)
        np.testing.assert_allclose(got[i], probs_ref[0, : len(label_sets[i % 2])],
                                   atol=1e-5, rtol=1e-5)

    # forced-inexact path: every affix falls back to pack+encode, results equal
    sched2 = StreamingScheduler(engine, tok, RT, max_wait_ms=200.0)
    import gliclass.c_tpu.tokenization as tkz

    orig_init = tkz.AffixEncoder.__init__

    def broken_init(self, *a, **k):
        orig_init(self, *a, **k)
        self.exact = False

    monkeypatch.setattr(tkz.AffixEncoder, "__init__", broken_init)
    futs2 = [
        sched2.submit(t, label_sets[i % 2], True) for i, t in enumerate(texts)
    ]
    got2 = [f.result(timeout=60) for f in futs2]
    sched2.close()
    for a, b in zip(got, got2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_submit_validates_types_and_group_faults_isolated(
    tiny_tokenizer_file, monkeypatch
):
    """(r5 review) A malformed request fails ITS caller at submit(); an
    encode fault in one label-set group fails only that group's requests,
    not the whole round."""
    from gliclass.c_tpu.parallel.scheduler import StreamingScheduler

    engine, tok = _tiny_engine_and_tok(tiny_tokenizer_file)
    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=200.0)
    with pytest.raises(ValueError, match="labels"):
        sched.submit("ok text", ["a", 3], True)
    with pytest.raises(ValueError, match="text"):
        sched.submit(None, ["a"], True)
    with pytest.raises(ValueError, match="labels"):
        sched.submit("ok text", [], True)

    # fault injection: the BOOM label set's encode raises; the other group
    # must still be answered
    import gliclass.c_tpu.tokenization as tkz

    orig = tkz.AffixEncoder.for_labels.__func__

    def boom(cls, tokenizer, labels, pf, max_length, sample_text=None):
        if "BOOM" in labels:
            raise RuntimeError("injected tokenize fault")
        return orig(cls, tokenizer, labels, pf, max_length, sample_text)

    monkeypatch.setattr(tkz.AffixEncoder, "for_labels", classmethod(boom))
    good = [sched.submit(f"text {i}", ["science", "sports"], True)
            for i in range(4)]
    bad = [sched.submit(f"text {i}", ["BOOM", "sports"], True)
           for i in range(3)]
    for f in good:
        assert f.result(timeout=60) is not None
    for f in bad:
        with pytest.raises(RuntimeError, match="injected tokenize fault"):
            f.result(timeout=60)
    sched.close()
