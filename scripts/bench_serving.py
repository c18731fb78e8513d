"""Steady-state serving throughput: StreamingScheduler under sustained load.

Measures the continuous-batching serving plane (the capability the reference
batch binary does not have at all, reference main.c:116-171) on the real
chip with the real-scale bundle — the number VERDICT r4 item 4 tracks
against the batch headline (target: >= 60% of it).

Load model: ``--clients`` submitter threads keep ``--inflight`` requests
outstanding each (closed-loop), submitting directly to the scheduler — the
HTTP layer is excluded on purpose: on the 2-CPU bench host an in-process
HTTP client measurably pollutes the number (r4 memory note), and the
scheduler IS the serving data plane. Warmup rounds compile every bucket
first; the timed window counts completed requests only.

Usage: python scripts/bench_serving.py [--seconds 20] [--clients 4]
       [--inflight 64] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time


def log(msg: str) -> None:
    print(f"[serve-bench] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--inflight", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--depth", type=int, default=4,
                    help="scheduler pipeline_depth")
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
    sched = StreamingScheduler(
        pipe.engine, pipe.tokenizer, runtime,
        max_wait_ms=args.max_wait_ms, max_pending=8192,
        pipeline_depth=args.depth,
    )

    rng = np.random.default_rng(0)
    words = (
        "science business sports politics travel health model format tool "
        "question statement animal fox dog running open source ai the quick"
    ).split()
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
        for _ in range(2048)
    ]
    labels = ["science", "business", "sports", "politics", "travel",
              "health", "format", "tool"]

    # Warmup: compile every bucket the workload can hit.
    log("warmup...")
    futs = [sched.submit(t, labels, True) for t in texts[:256]]
    for f in futs:
        f.result(timeout=600)

    log(f"timed window: {args.seconds}s, {args.clients} clients x "
        f"{args.inflight} in flight")
    stop = time.monotonic() + args.seconds
    done = [0] * args.clients
    errors = [0] * args.clients

    def client(ci: int):
        import itertools

        it = itertools.cycle(texts[ci::args.clients])
        while time.monotonic() < stop:
            futs = [
                sched.submit(next(it), labels, True)
                for _ in range(args.inflight)
            ]
            for f in futs:
                try:
                    f.result(timeout=600)
                    done[ci] += 1
                except Exception:
                    errors[ci] += 1

    t0 = time.monotonic()
    threads = [
        threading.Thread(target=client, args=(ci,))
        for ci in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    sched.close()

    total = sum(done)
    rate = total / dt
    log(f"completed {total} requests in {dt:.2f}s "
        f"({sum(errors)} errors) -> {rate:.1f} req/s steady-state")
    print(f"{{\"metric\": \"serving steady-state\", \"value\": {rate:.1f}, "
          f"\"unit\": \"req/s\"}}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
