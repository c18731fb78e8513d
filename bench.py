"""Benchmark: gliclass-base-v1.0 geometry, INT8 weight-only, end-to-end
throughput (tokenize -> bucketed batches -> jitted forward -> probabilities).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "texts/s/chip", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); vs_baseline is
measured against the north-star target of 10k texts/s on v5e-16 at INT8
=> 625 texts/s/chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

TARGET_PER_CHIP = 10_000 / 16  # north star: >=10k texts/s on v5e-16


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def build_tokenizer(path: str):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from helpers import build_tiny_tokenizer

    if not os.path.exists(path):
        build_tiny_tokenizer(path)
    from gliclass.c_tpu.tokenization import PromptTokenizer

    return PromptTokenizer.from_file(path)


def main() -> None:
    t0 = time.time()
    import numpy as np

    import jax

    # Persistent compile cache: recompiles through the remote-compile tunnel
    # are expensive; cache them across bench runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gliclass.c_tpu.config import GLiClassConfig, RuntimeConfig, deberta_v3_config
    from gliclass.c_tpu.data import parse_job
    from gliclass.c_tpu.engine import InferenceEngine
    from gliclass.c_tpu.models.gliclass import init_gliclass_params
    from gliclass.c_tpu.ops.quant import quantize_tree
    from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline

    platform = jax.devices()[0].platform
    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()} (platform={platform})")

    tok = build_tokenizer("/tmp/gliclass_bench_tokenizer.json")

    cfg = GLiClassConfig(
        original_model_name="knowledgator/gliclass-base-v1.0 (geometry, random weights)",
        hidden_size=768,
        class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id,
        prompt_first=True,
        backbone=deberta_v3_config("base"),
    )
    log("initializing params (bf16, on host)...")
    # Init + quantize on host CPU: avoids shipping ~370MB of random weights
    # device->host through the tunnel just to quantize them.
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_gliclass_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        log("quantizing to INT8...")
        qparams = quantize_tree(jax.tree.map(np.asarray, params))
    del params

    runtime = RuntimeConfig(
        batch_size=int(os.environ.get("BENCH_BATCH", "128")),
        max_length=512,
        compute_dtype="bfloat16",
        quant_mode="int8",
        seq_buckets=(96, 128, 192, 256, 384, 512),
        label_buckets=(8,),
        dp_size=1,
        tp_size=1,
    )
    engine = InferenceEngine(cfg, qparams, runtime)
    pipe = ZeroShotClassificationPipeline(engine, tok, runtime)

    # 1k-text multi-label topic-classification job (BASELINE.json config #2 shape)
    rng = np.random.default_rng(0)
    words = (
        "science business sports politics travel health model format tool "
        "question statement animal fox dog running open source ai the quick"
    ).split()
    n_texts = int(os.environ.get("BENCH_TEXTS", "1024"))
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
        for _ in range(n_texts)
    ]
    labels = [["science", "business", "sports", "politics", "travel", "health", "format", "tool"]]
    job = parse_job(
        {
            "texts": texts,
            "labels": labels,
            "same_labels": True,
            "classification_type": "multi-label",
        }
    )

    log(f"warmup ({time.time()-t0:.1f}s elapsed)...")
    pipe.classify_job(job)  # includes compile
    log("timed runs...")
    runs = []
    for _ in range(3):
        t = time.perf_counter()
        out = pipe.classify_job(job)
        runs.append(time.perf_counter() - t)
    best = min(runs)
    texts_per_s = n_texts / best
    per_chip = texts_per_s / max(n_chips, 1)
    log(f"runs: {[f'{r:.3f}s' for r in runs]}; {texts_per_s:.1f} texts/s "
        f"({per_chip:.1f}/chip); sample decisions: {len(out.results[0].decisions)}")
    log(f"stage breakdown: {out.timings}")

    # Secondary config (stderr only): RAG-reranker shape — long passages at
    # S=512 exercising the fused attention kernel (BASELINE.json config #3).
    if os.environ.get("BENCH_SKIP_RERANKER") != "1":
        rr_texts = [
            " ".join(rng.choice(words, size=300)) for _ in range(128)
        ]
        rr_job = parse_job(
            {
                "texts": rr_texts,
                "labels": [["relevant", "irrelevant"]],
                "same_labels": True,
                "classification_type": "single-label",
            }
        )
        pipe.classify_job(rr_job)  # compile
        t = time.perf_counter()
        rr = pipe.classify_job(rr_job)
        dt = time.perf_counter() - t
        log(f"reranker config (128 passages, S=512 bucket): "
            f"{len(rr_texts)/dt:.1f} texts/s; stages {rr.timings}")
        # Speed-of-light accounting (BASELINE.md kernel requirement): the
        # reranker run is one compiled step at [128, 512] on this chip.
        from gliclass.c_tpu.utils.perf import speed_of_light

        if platform == "tpu" and rr.timings:
            sol = speed_of_light(
                cfg, len(rr_texts), 512, rr.timings["device_s"], chip="v5e"
            )
            log(f"speed-of-light (S=512 step): {sol}")

    # Per-kernel measured-vs-SoL table (BASELINE.md per-kernel accounting):
    # the serving building blocks probed in isolation at two step shapes.
    if platform == "tpu" and os.environ.get("BENCH_SKIP_KERNEL_TABLE") != "1":
        from gliclass.c_tpu.utils.perf import format_kernel_report, per_kernel_report

        for B, S in ((int(os.environ.get("BENCH_BATCH", "128")), 96), (128, 512)):
            rows = per_kernel_report(cfg, B, S, quant_mode="int8", chip="v5e")
            log(f"per-kernel SoL @ [B={B}, S={S}]:\n" + format_kernel_report(rows))

    print(
        json.dumps(
            {
                "metric": "gliclass-base int8 e2e throughput",
                "value": round(per_chip, 1),
                "unit": "texts/s/chip",
                "vs_baseline": round(per_chip / TARGET_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
