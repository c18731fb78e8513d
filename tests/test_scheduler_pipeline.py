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
    """A failing request batch must fail its futures, not kill the loop."""
    tok, cfg, engine = setup

    class Boom(Exception):
        pass

    sched = StreamingScheduler(engine, tok, RT, max_wait_ms=1.0)
    try:
        orig = sched.engine.run_async
        calls = {"n": 0}

        def flaky(batch, max_labels):
            calls["n"] += 1
            if calls["n"] == 1:
                raise Boom("injected")
            return orig(batch, max_labels)

        sched.engine.run_async = flaky
        f1 = sched.submit("the quick brown fox", ["science"], True)
        with pytest.raises(Boom):
            f1.result(timeout=120)
        f2 = sched.submit("why are you running", ["question"], True)
        assert f2.result(timeout=120).shape == (1,)
    finally:
        sched.engine.run_async = orig
        sched.close()
