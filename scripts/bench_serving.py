"""Steady-state serving throughput: StreamingScheduler under sustained load.

Measures the continuous-batching serving plane (the capability the reference
batch binary does not have at all, reference main.c:116-171) on the real
chip with the real-scale bundle — the number VERDICT r4 item 4 tracks
against the batch headline (target: >= 60% of it).

Two load modes:

  * ``backlog`` (default) — pre-submit N requests, time until every Future
    resolves. No client threads run in the timed window, so the number is
    the scheduler DATA-PLANE capacity, directly comparable to the batch
    plane on the same texts. Measured r5 (v5e, w8a8, round_requests=1024,
    depth 4): 6,062 req/s = 77% of the 7,919 texts/s batch plane on the
    same engine.
  * ``closed-loop`` — ``--clients`` submitter threads keep ``--inflight``
    requests outstanding each. Exercises the full concurrent-submit path,
    but on the 2-CPU bench host the client threads themselves contend for
    the GIL with the scheduler's three pipeline stages: measured 2-3.7k
    req/s with large run-to-run variance (r4/r5 memory note — in-process
    load generators pollute 2-CPU measurements). Prefer external load
    generators for SLO work.

Usage: python scripts/bench_serving.py [--mode backlog|closed-loop]
       [--requests 8192] [--seconds 20] [--clients 2] [--inflight 256]
       [--batch 128] [--rounds 1024] [--depth 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

# Runnable as `python scripts/bench_serving.py` from the repo root without
# an install: the package lives one directory up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[serve-bench] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["backlog", "closed-loop"],
                    default="backlog")
    ap.add_argument("--requests", type=int, default=8192,
                    help="backlog mode: requests per timed drain")
    ap.add_argument("--seconds", type=float, default=20.0,
                    help="closed-loop mode: timed window")
    ap.add_argument("--clients", type=int, default=2)
    ap.add_argument("--inflight", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=1024,
                    help="scheduler round_requests")
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--depth", type=int, default=4,
                    help="scheduler pipeline_depth")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from gliclass.c_tpu.config import RuntimeConfig
    from gliclass.c_tpu.parallel.scheduler import StreamingScheduler
    from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline
    from gliclass.c_tpu.utils.realscale import ensure_realscale_bundle

    bundle = ensure_realscale_bundle(log=log)
    runtime = RuntimeConfig(
        batch_size=args.batch,
        max_length=512,
        compute_dtype="bfloat16",
        quant_mode=os.environ.get("BENCH_QUANT", "int8-dynamic"),
        # Serving keeps COARSE buckets: fine ladders fragment micro-batches
        # (measured r4: 51 vs 279 texts/s over HTTP with the fine ladder).
        seq_buckets=(64, 96, 128, 256, 512),
        label_buckets=(8,),
    )
    pipe = ZeroShotClassificationPipeline.from_bundle(bundle, runtime)

    rng = np.random.default_rng(0)
    words = (
        "science business sports politics travel health model format tool "
        "question statement animal fox dog running open source ai the quick"
    ).split()
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
        for _ in range(max(2048, args.requests))
    ]
    labels = ["science", "business", "sports", "politics", "travel",
              "health", "format", "tool"]

    def make_sched():
        return StreamingScheduler(
            pipe.engine, pipe.tokenizer, runtime,
            max_wait_ms=args.max_wait_ms,
            max_pending=max(8192, 2 * args.requests),
            pipeline_depth=args.depth, round_requests=args.rounds,
        )

    rates = []
    for rep in range(args.repeats):
        sched = make_sched()
        # Warm with two FULL untimed drains: a sustained drain discovers the
        # whole (row-bucket x stack-depth) executable variety its round
        # splits produce, and each first-touch costs an in-process
        # compile-cache LOAD (~0.3 s through the tunnel) even when the
        # persistent disk cache hits — measured as a deterministic
        # per-process ramp (1,063 -> 2,768 -> 5,697 req/s over three drains
        # with only small warmups). Two full drains reach steady state.
        if rep == 0:
            for _ in range(2):
                futs = [
                    sched.submit(t, labels, True)
                    for t in texts[: args.requests]
                ]
                for f in futs:
                    f.result(timeout=600)

        if args.mode == "backlog":
            t0 = time.perf_counter()
            futs = [
                sched.submit(t, labels, True)
                for t in texts[: args.requests]
            ]
            for f in futs:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
            rate = args.requests / dt
        else:
            stop = time.monotonic() + args.seconds
            done = [0] * args.clients

            def client(ci: int):
                import itertools

                it = itertools.cycle(texts[ci :: args.clients])
                while time.monotonic() < stop:
                    fs = [
                        sched.submit(next(it), labels, True)
                        for _ in range(args.inflight)
                    ]
                    for f in fs:
                        try:
                            f.result(timeout=600)
                            done[ci] += 1
                        except Exception:
                            pass

            t0 = time.monotonic()
            threads = [
                threading.Thread(target=client, args=(ci,))
                for ci in range(args.clients)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            rate = sum(done) / (time.monotonic() - t0)
        sched.close()
        rates.append(rate)
        log(f"rep {rep}: {rate:.1f} req/s")

    best, med = max(rates), sorted(rates)[len(rates) // 2]
    log(f"{args.mode}: best {best:.1f} / median {med:.1f} req/s "
        f"(rounds={args.rounds}, depth={args.depth})")
    print(f"{{\"metric\": \"serving steady-state ({args.mode})\", "
          f"\"value\": {best:.1f}, \"unit\": \"req/s\", "
          f"\"median\": {med:.1f}}}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
