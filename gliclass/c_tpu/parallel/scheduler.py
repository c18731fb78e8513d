"""Batch planning + continuous-batching scheduler.

Replaces the reference's L4/L5 scheduling design — three strict barrier phases
(all preprocess, then all inference, then all postprocess; reference
main.c:116-155) over compile-time-fixed batches (BATCH_SIZE,
reference include/configs.h:4) — with:

  * shape-bucketed batch assembly: prompts are grouped by (seq bucket, label
    bucket) so every device step hits a cached XLA executable (SURVEY §7 hard
    part #3: the reference's pad-to-batch-max is exactly what XLA punishes);
  * software pipelining: tokenization of batch k+1 overlaps device execution of
    batch k via async dispatch (no phase barriers);
  * a thread-safe streaming scheduler with micro-batching for serving
    (requests arrive continuously; each is answered exactly once).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Sequence

import numpy as np

from ..config import RuntimeConfig
from ..engine import InferenceEngine
from ..prompting import pack_prompt
from ..tokenization import PromptTokenizer, TokenizedBatch


@dataclass
class PlannedBatch:
    indices: list[int]  # positions in the original request order
    batch: TokenizedBatch
    max_labels: int


def plan_batches(
    tokenizer: PromptTokenizer,
    prompts: Sequence[str],
    label_counts: Sequence[int],
    runtime: RuntimeConfig,
) -> list[PlannedBatch]:
    """Tokenize all prompts and group them into shape-bucketed batches.

    Greedy assembly: requests are bucketed by (seq bucket, label bucket); each
    bucket is chunked into batches of ``runtime.batch_size``. Returned batches
    preserve no global order — each carries its original indices for demux.
    """
    enc = tokenizer.encode_batch_parallel(
        prompts, max_length=runtime.max_length, pad_to=None,
        chunk_size=128, workers=runtime.tokenizer_workers,
    )
    return plan_from_encoded(tokenizer, enc, label_counts, runtime)


def plan_from_encoded(
    tokenizer: PromptTokenizer,
    enc: TokenizedBatch,
    label_counts: Sequence[int],
    runtime: RuntimeConfig,
) -> list[PlannedBatch]:
    """Bucket/assembly half of :func:`plan_batches` for ALREADY-ENCODED
    prompts — the streaming scheduler's tokenize stage encodes on its own
    thread and hands the result here (pipelining tokenize off the dispatch
    critical path, VERDICT r4 item 4)."""
    n = len(label_counts)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        sb = runtime.bucket_for_seq(int(enc.lengths[i]))
        lb = runtime.bucket_for_labels(label_counts[i])
        buckets.setdefault((sb, lb), []).append(i)

    planned: list[PlannedBatch] = []
    for (sb, lb), idxs in sorted(buckets.items()):
        for k in range(0, len(idxs), runtime.batch_size):
            chunk = idxs[k : k + runtime.batch_size]
            ids = np.full((len(chunk), sb), tokenizer.pad_token_id, dtype=np.int32)
            mask = np.zeros((len(chunk), sb), dtype=np.int32)
            lens = np.zeros((len(chunk),), dtype=np.int32)
            for row, i in enumerate(chunk):
                L = min(int(enc.lengths[i]), sb)
                ids[row, :L] = enc.input_ids[i, :L]
                mask[row, :L] = 1
                lens[row] = L
            planned.append(
                PlannedBatch(chunk, TokenizedBatch(ids, mask, lens), lb)
            )
    return planned


@dataclass
class BatchFailure:
    """One planned batch that failed after its retry (SURVEY §5: fail-fast
    WITH job-level retry — a transient device fault costs one batch one retry,
    never the job; the reference would crash on it, reference
    src/postprocessor.c:32-44 NULL deref)."""

    indices: list[int]  # original request positions
    error: str

    def to_dict(self) -> dict:
        return {"indices": list(self.indices), "error": self.error}


# Compile-variety bound: at most this many batches fold into one stacked
# executable, so each (seq, labels) bucket compiles at most _MAX_STACK
# distinct stack depths (all persisted in the on-disk compile cache).
_MAX_STACK = 16


def run_planned(
    engine: InferenceEngine,
    planned: Sequence[PlannedBatch],
    num_requests: int,
    max_label_count: int,
    failures: list[BatchFailure] | None = None,
) -> np.ndarray:
    """Execute planned batches with async pipelining; demux into request order.

    Returns probs [num_requests, max_label_count] (f32); slots beyond each
    request's label count are 0.

    Batches of the same (seq bucket, label bucket) are STACKED into one
    executable launch (``lax.scan`` over the stack inside the jit) — each
    launch carries a fixed host cost that at serving shapes exceeds the
    per-batch device time several-fold (engine._get_stack_step), so a job
    costs one launch per shape bucket, not one per batch.

    Failure semantics: a stacked launch that fails is decomposed — each of its
    batches is re-dispatched ONCE individually (fresh dispatch, same inputs).
    A single batch whose dispatch/execution fails is likewise retried ONCE.
    If the retry also fails and ``failures`` is a list, a
    :class:`BatchFailure` is appended for that batch's texts (their
    probability rows stay 0) and the rest of the job completes; with
    ``failures=None`` the second error propagates (callers that cannot report
    partial results keep fail-fast behavior).
    """
    out = np.zeros((num_requests, max_label_count), dtype=np.float32)
    in_flight = dispatch_planned(engine, planned, out, max_label_count, failures)
    _drain_in_flight(engine, in_flight, out, max_label_count, failures)
    return out


def dispatch_planned(
    engine: InferenceEngine,
    planned: Sequence[PlannedBatch],
    out: np.ndarray,
    max_label_count: int,
    failures: list[BatchFailure] | None,
) -> "list[_InFlight]":
    """Dispatch phase of :func:`run_planned`: stack-grouped async launches,
    no waiting. The returned in-flight list goes to
    :func:`_drain_in_flight` — possibly on ANOTHER thread (the streaming
    scheduler drains round k while dispatching round k+1)."""
    in_flight: list[_InFlight] = []

    # Stack only batches of IDENTICAL row count (grouping key includes it):
    # padding a 10-row tail batch to 128 rows inside a stack costs a full
    # extra device step (~15ms at [128,96]) to save one ~4ms launch.
    groups: dict[tuple[int, int, int], list[PlannedBatch]] = {}
    for pb in planned:
        key = (pb.batch.seq_length, pb.max_labels, pb.batch.batch_size)
        groups.setdefault(key, []).append(pb)

    # Dispatch everything first: XLA queues the launches back-to-back on
    # device, and per-batch outputs are tiny ([batch, labels] probabilities),
    # so there is no memory reason to throttle.
    for (_, max_labels, _), pbs in sorted(groups.items()):
        for c0 in range(0, len(pbs), _MAX_STACK):
            _dispatch_launch(
                engine, pbs[c0 : c0 + _MAX_STACK], max_labels, out,
                max_label_count, failures, in_flight,
            )
    return in_flight


def _dispatch_launch(
    engine: InferenceEngine,
    pbs: list[PlannedBatch],
    max_labels: int,
    out: np.ndarray,
    max_label_count: int,
    failures: list[BatchFailure] | None,
    in_flight: "list[_InFlight]",
) -> None:
    """Dispatch 1..n same-shape batches as ONE executable launch (stacked
    when n > 1). A failed stacked dispatch is decomposed: each batch gets the
    standard one-retry-then-isolate treatment (:func:`_retry_batch`)."""
    if len(pbs) == 1:
        pb = pbs[0]
        try:
            dev, n = engine.run_async(pb.batch, pb.max_labels)
        except Exception as e:
            _retry_batch(engine, pb, e, out, max_label_count, failures)
            return
        in_flight.append(_InFlight([pb], dev, [n]))
        return
    ids, mask, rows = engine.stack_batches([pb.batch for pb in pbs])
    try:
        dev = engine.run_stacked_async(ids, mask, max_labels)
    except Exception as e:
        for pb in pbs:
            _retry_batch(engine, pb, e, out, max_label_count, failures)
        return
    in_flight.append(_InFlight(pbs, dev, rows))


def _scatter(pb: PlannedBatch, probs: np.ndarray, out: np.ndarray,
             max_label_count: int) -> None:
    width = min(pb.max_labels, max_label_count)
    out[np.asarray(pb.indices), :width] = probs[:, :width]


def _retry_batch(
    engine: InferenceEngine,
    pb: PlannedBatch,
    first_error: Exception,
    out: np.ndarray,
    max_label_count: int,
    failures: list[BatchFailure] | None,
) -> None:
    """One synchronous retry (fresh dispatch + transfer); on a second failure
    record a BatchFailure (or re-raise when no failure channel exists)."""
    try:
        _scatter(pb, engine.run(pb.batch, pb.max_labels), out, max_label_count)
    except Exception as retry_error:
        if failures is None:
            raise
        failures.append(
            BatchFailure(
                pb.indices,
                f"{type(first_error).__name__}: {first_error} "
                f"(retry: {type(retry_error).__name__}: {retry_error})",
            )
        )


@dataclass
class _InFlight:
    """One dispatched launch: a single batch (dev [B, L]) or a stacked group
    (dev [nb, B0, L]); ``rows`` holds each batch's valid row count."""

    pbs: list[PlannedBatch]
    dev: Any
    rows: list[int]

    @property
    def stacked(self) -> bool:
        return len(self.pbs) > 1


def _drain_in_flight(
    engine: InferenceEngine,
    in_flight: list[_InFlight],
    out: np.ndarray,
    max_label_count: int,
    failures: list[BatchFailure] | None,
) -> None:
    """Collect dispatched launches into ``out`` (request order)."""
    import jax.numpy as jnp

    def drain_one(fl: _InFlight) -> None:
        try:
            probs = np.asarray(fl.dev)
        except Exception as e:
            for pb in fl.pbs:
                _retry_batch(engine, pb, e, out, max_label_count, failures)
            return
        if fl.stacked:
            for i, pb in enumerate(fl.pbs):
                _scatter(pb, probs[i, : fl.rows[i]], out, max_label_count)
        else:
            _scatter(fl.pbs[0], probs[: fl.rows[0]], out, max_label_count)

    if len(in_flight) > 1:
        # One device-side concat + a single host transfer instead of one
        # round-trip per launch (host<->device latency is the per-step tax).
        # Width-padding is semantics-free: padded label slots are probability
        # exactly 0 by the head's hard mask.
        wmax = max(fl.dev.shape[-1] for fl in in_flight)
        try:
            padded = []
            for fl in in_flight:
                dev = fl.dev
                if dev.ndim == 3:
                    dev = dev.reshape(-1, dev.shape[-1])
                if dev.shape[-1] != wmax:
                    dev = jnp.pad(dev, ((0, 0), (0, wmax - dev.shape[-1])))
                padded.append(dev)
            flat = np.asarray(jnp.concatenate(padded, axis=0))
        except Exception:
            # The single transfer hides WHICH launch failed: fall back to
            # per-launch transfers so the fault is isolated and retried alone.
            for fl in in_flight:
                drain_one(fl)
            return
        row = 0
        for fl in in_flight:
            if fl.stacked:
                B0 = fl.dev.shape[1]
                for i, pb in enumerate(fl.pbs):
                    _scatter(pb, flat[row + i * B0 : row + i * B0 + fl.rows[i]],
                             out, max_label_count)
                row += len(fl.pbs) * B0
            else:
                _scatter(fl.pbs[0], flat[row : row + fl.rows[0]], out,
                         max_label_count)
                row += fl.dev.shape[0]
    else:
        for fl in in_flight:
            drain_one(fl)


def plan_and_run_overlapped(
    engine: InferenceEngine,
    tokenizer: PromptTokenizer,
    prompts: Sequence[str] | None,
    label_counts: Sequence[int],
    runtime: RuntimeConfig,
    num_requests: int,
    max_label_count: int,
    chunk: int = 256,
    failures: list[BatchFailure] | None = None,
    timer=None,
    pack_fn: Callable[[int, int], Sequence[str]] | None = None,
    encode_chunk_fn: Callable[[int, int], TokenizedBatch] | None = None,
) -> np.ndarray:
    """Tokenize-and-dispatch pipeline: bucketed batches go to the device as
    soon as they fill, while the host tokenizes the next chunk.

    ``pack_fn(lo, hi)``: optional lazy prompt packer — when given,
    ``prompts`` may be None and each chunk is PACKED inside the tokenize
    stream (producer thread), hiding the prompt-packing pass (~34 ms for a
    4096-text job, measured serial up-front before this) under device
    execution along with tokenization.

    ``encode_chunk_fn(lo, hi)``: optional full replacement of the chunk's
    pack+tokenize step (returns a TokenizedBatch directly) — the
    same-labels AffixEncoder fast path (tokenization.AffixEncoder): the
    shared label block is encoded once per JOB instead of once per text.
    Takes precedence over ``prompts``/``pack_fn``.

    XLA dispatch is async, so the device crunches batch k while the host
    encodes chunk k+1 — tokenization time hides under device time for jobs
    larger than one chunk. By DEFAULT tokenization runs on a producer thread
    (one GIL-releasing Rust ``encode_batch`` per ramped chunk; Rayon
    parallelizes internally) while this thread assembles and dispatches —
    measured faster than single-thread streaming on the 2-CPU host (see
    ``encoded_chunks``). GLICLASS_TPU_PIPELINE_TOKENIZE=0 opts out back to
    single-thread streaming (tokenize and dispatch interleaved on one
    thread).

    Filled same-shape batches are folded into STACKED launches with a
    SELF-CLOCKING policy: every arrival dispatches ALL currently-ready
    batches of its shape key as one launch (capped at ``_MAX_STACK``). When
    tokenize is slower than the device (the measured headline regime), each
    launch carries one batch and nothing ever waits; when batches arrive
    faster than the device drains (bursts, short sequences), stacks grow
    naturally and amortize the fixed per-launch host cost. This replaced a
    geometric-quota policy (1,2,4,...) that was measured HOLDING BATCHES
    BACK in the tokenize-paced regime — the device idled while a quota
    waited to fill (260 -> 220 ms headline on the tunneled v5e).
    GLICLASS_TPU_STREAM_STACK=0 restores one-launch-per-batch for A/B.

    ``timer``: optional StageTimer receiving the host-side attribution of
    this call (``h_tokenize`` = blocking tokenize waits, ``h_dispatch`` =
    batch assembly + launch, ``h_drain`` = device wait + transfer + demux).

    Semantically identical to plan_batches + run_planned (same bucketing, same
    demux, same one-retry-then-isolate failure handling); the reference's
    three-phase barrier design made this impossible (reference main.c:116-155).
    """
    import os

    bs = runtime.batch_size
    accum: dict[tuple[int, int], list[tuple[int, np.ndarray, int]]] = {}
    ready: dict[tuple[int, int], list[PlannedBatch]] = {}
    stack_cap = (
        1 if os.environ.get("GLICLASS_TPU_STREAM_STACK") == "0" else _MAX_STACK
    )
    in_flight: list[_InFlight] = []
    out = np.zeros((num_requests, max_label_count), dtype=np.float32)
    from ..utils.metrics import StageTimer

    timer = timer if timer is not None else StageTimer()

    def make_pb(key: tuple[int, int], idxs_rows: list[tuple[int, np.ndarray, int]]):
        sb, lb = key
        ids = np.full((len(idxs_rows), sb), tokenizer.pad_token_id, dtype=np.int32)
        mask = np.zeros((len(idxs_rows), sb), dtype=np.int32)
        lens = np.zeros((len(idxs_rows),), dtype=np.int32)
        idxs = []
        for row, (i, enc_row, L) in enumerate(idxs_rows):
            ids[row, :L] = enc_row[:L]
            mask[row, :L] = 1
            lens[row] = L
            idxs.append(i)
        return PlannedBatch(idxs, TokenizedBatch(ids, mask, lens), lb)

    def dispatch_ready(key: tuple[int, int]):
        """Launch every ready batch of this key now as ONE stacked launch
        (chunked at the stack cap).

        Both policies were measured on the tunneled v5e (r4, w8a8 headline):
        a scan iteration costs ~+2.2 ms device time over a pipelined single
        launch (17.3 vs 15.0 ms/step), BUT each single launch costs ~3 ms of
        HOST work (assembly + fresh-input transfer) that competes with the
        producer thread's tokenize on the 2-CPU host — one-launch-per-batch
        measured 724 ms vs 611 ms stacked on a 4096-text job (tokenize waits
        ballooned 314 -> 464 ms). Stacking what's ready wins end-to-end even
        though the stacked step is slower in isolation."""
        pbs = ready.pop(key, [])
        if not pbs:
            return
        with timer.stage("h_dispatch"):
            for c0 in range(0, len(pbs), stack_cap):
                _dispatch_launch(
                    engine, pbs[c0 : c0 + stack_cap], key[1], out,
                    max_label_count, failures, in_flight,
                )

    def encoded_chunks():
        """(chunk start, encoded chunk) stream. DEFAULT: producer thread —
        the Rust BPE (GIL-releasing, Rayon-parallel internally) encodes chunk
        k+1 while this thread assembles and dispatches chunk k, so tokenize
        runs continuously instead of gapping between dispatch work. Measured
        on the 2-CPU v5e host (r4, 1024-text headline): 238 ms single-thread
        -> 206 ms producer-thread, with tight run-to-run variance (r3 had
        measured the producer NEUTRAL, but that was with Python-side
        sub-chunked tokenize at 1 worker, which starved Rayon — see sync()).
        GLICLASS_TPU_PIPELINE_TOKENIZE=0 restores single-thread streaming."""
        import os

        def sync():
            # Ramped chunk sizes: a small first chunk reaches the device fast
            # (latency), later chunks grow to the full ``chunk`` (throughput).
            # Each chunk is ONE Rust encode_batch call — the tokenizers core
            # parallelizes internally (Rayon); Python-side sub-chunking with
            # capped workers only added overhead on the 2-CPU host (measured:
            # 63 ms for one 1024-prompt call vs 75-83 ms sub-chunked).
            sizes = [s for s in (64, 128) if s < chunk] or [chunk]
            total = (
                num_requests
                if (pack_fn is not None or encode_chunk_fn is not None)
                else len(prompts)
            )
            c0 = 0
            while c0 < total:
                n = sizes.pop(0) if sizes else chunk
                hi = min(c0 + n, total)
                if encode_chunk_fn is not None:
                    yield c0, encode_chunk_fn(c0, hi)
                else:
                    chunk_prompts = (
                        pack_fn(c0, hi)
                        if pack_fn is not None
                        else prompts[c0:hi]
                    )
                    yield c0, tokenizer.encode_batch(
                        chunk_prompts, max_length=runtime.max_length,
                        pad_to=None,
                    )
                c0 += n

        if os.environ.get("GLICLASS_TPU_PIPELINE_TOKENIZE", "1") == "0":
            yield from sync()
            return
        q: queue.Queue = queue.Queue(maxsize=4)
        # Close-aware shutdown: if the consumer loop exits early (a dispatch
        # error propagates and this generator is closed), the producer must
        # not block forever on a full queue — it would leak a daemon thread
        # pinning every encoded chunk of the failed job in a long-lived
        # serving process. The producer's put() polls this stop flag.
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in sync():
                    if not put(item):
                        return
                put(None)
            except BaseException as e:  # surfaced in the consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            t.join()
        finally:
            stop.set()

    chunks = iter(encoded_chunks())
    while True:
        with timer.stage("h_tokenize"):
            item = next(chunks, None)
        if item is None:
            break
        c0, enc = item
        touched = set()
        for j in range(len(enc.lengths)):
            i = c0 + j
            L = int(enc.lengths[j])
            sb = runtime.bucket_for_seq(L)
            lb = runtime.bucket_for_labels(label_counts[i])
            key = (sb, lb)
            accum.setdefault(key, []).append((i, enc.input_ids[j], min(L, sb)))
            if len(accum[key]) == bs:
                with timer.stage("h_dispatch"):
                    ready.setdefault(key, []).append(make_pb(key, accum.pop(key)))
                touched.add(key)
        # Dispatch once per chunk: batches filled WITHIN one tokenize chunk
        # stack together (sub-ms extra latency), batches from different
        # chunks never wait on each other.
        for key in sorted(touched):
            dispatch_ready(key)
    # Flush. Pending FILLED stacks launch together; the (at most one per key)
    # partial tail batch launches alone — stacking it would row-pad it to the
    # full batch size and cost an entire extra scan step of device time to
    # save one launch (the run_planned identical-row-count rule).
    for key in sorted(ready):
        dispatch_ready(key)
    for key in sorted(accum):
        with timer.stage("h_dispatch"):
            _dispatch_launch(
                engine, [make_pb(key, accum.pop(key))], key[1], out,
                max_label_count, failures, in_flight,
            )

    with timer.stage("h_drain"):
        _drain_in_flight(engine, in_flight, out, max_label_count, failures)
    return out


# ---------------------------------------------------------------------------
# Streaming (continuous batching) scheduler
# ---------------------------------------------------------------------------
@dataclass
class _Request:
    text: str
    labels: tuple[str, ...]
    prompt_first: bool
    future: Future = field(default_factory=Future)

    @property
    def num_labels(self) -> int:
        return len(self.labels)

    @property
    def prompt(self) -> str:
        """Packed prompt — built only on the slow path (the affix fast path
        never materializes per-request prompt strings)."""
        return pack_prompt(self.text, list(self.labels), self.prompt_first)


class SchedulerOverloaded(RuntimeError):
    """Raised by submit() when the bounded request queue is full — the
    backpressure signal (serving maps it to HTTP 429)."""


class SchedulerClosed(RuntimeError):
    """Raised by submit() after close(), and set on any request still queued
    at close() time, so no caller ever blocks on a Future that can no longer
    be fulfilled."""


class StreamingScheduler:
    """Continuous-batching request scheduler for serving.

    Requests are enqueued from any thread and flow through a THREE-stage
    thread pipeline (VERDICT r4 item 4 — tokenize off the dispatch critical
    path):

      1. tokenizer thread — micro-batches requests (up to
         ``runtime.batch_size``, waiting at most ``max_wait_ms`` for the
         round to fill) and encodes the round's prompts in ONE GIL-releasing
         Rust ``encode_batch`` call (Rayon-parallel internally);
      2. dispatcher thread — buckets the encoded round by shape
         (:func:`plan_from_encoded`), assembles batches and fires async
         device launches;
      3. drainer thread — waits out each round's device execution + result
         transfer and fulfils each request's Future exactly once.

    The stages overlap: round k+2 tokenizes while round k+1 dispatches and
    round k transfers — neither the Rust BPE nor the ~30 ms tunneled result
    round trip serializes rounds. ``pipeline_depth`` bounds rounds in flight
    on device (HBM for round inputs/outputs is bounded by depth).

    ``max_pending`` bounds the request queue: submit() raises
    :class:`SchedulerOverloaded` instead of queueing unboundedly (the
    reference, a batch binary, had no such concern; a long-running service
    needs backpressure).
    """

    def __init__(
        self,
        engine: InferenceEngine,
        tokenizer: PromptTokenizer,
        runtime: RuntimeConfig | None = None,
        max_wait_ms: float = 5.0,
        max_pending: int = 4096,
        pipeline_depth: int = 4,
        round_requests: int | None = None,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.runtime = runtime or RuntimeConfig()
        self.max_wait_s = max_wait_ms / 1e3
        # Requests collected per round. One round = one tokenize call + one
        # plan + one dispatch + one drain transfer — the per-round host work
        # is roughly constant, so bigger rounds amortize it (multiple
        # same-bucket batches in a round fold into STACKED launches).
        # Measured r5 (v5e, 8192-request backlog drain, depth 4, best of 2):
        # rounds of 128 / 512 / 1024 -> 3,185 / 3,615 / 6,062 req/s — the
        # 1024-round capacity is 77% of the batch plane measured on the SAME
        # engine and texts (7,919 texts/s). (Closed-loop in-process clients
        # measure 2-3.7k req/s with huge variance: on the 2-CPU bench host
        # the client threads themselves pollute the number — see
        # scripts/bench_serving.py for both load modes.) Under light load
        # rounds close at max_wait_ms anyway, so latency is unaffected.
        # Default 8x batch_size.
        self.round_requests = (
            round_requests
            if round_requests is not None
            else 8 * self.runtime.batch_size
        )
        self._q: queue.Queue[_Request | None] = queue.Queue(maxsize=max_pending)
        self._running = True
        # Guards the {check _running -> enqueue} pair in submit() against
        # close(): without it a request enqueued between close()'s flag flip
        # and its drain loop would hold a Future that is never resolved (the
        # caller would block until its timeout instead of failing fast).
        self._submit_lock = threading.Lock()
        # Stage hand-offs. _plan_q carries (reqs, encoded round) from the
        # tokenizer to the dispatcher; _drain_q carries dispatched rounds to
        # the drainer. Depth bounds rounds in flight (r4 ran depth 2 with
        # tokenize inline in the dispatcher; splitting tokenize out and
        # deepening the queues is what lets short rounds keep the device fed
        # through the ~30 ms result round trips).
        self._plan_q: queue.Queue = queue.Queue(maxsize=pipeline_depth)
        self._drain_q: queue.Queue = queue.Queue(maxsize=pipeline_depth)
        # per-(labels, prompt_first) AffixEncoder cache (see _encode_round)
        self._affix_cache: dict[tuple, Any] = {}
        self._tokenizer_thread = threading.Thread(
            target=self._tokenize_loop, daemon=True
        )
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._drainer = threading.Thread(target=self._drain_loop, daemon=True)
        self._drainer.start()
        self._thread.start()
        self._tokenizer_thread.start()

    def submit(self, text: str, labels: Sequence[str], prompt_first: bool) -> Future:
        """Returns a Future resolving to probs np.ndarray [len(labels)].

        Validates types HERE so a malformed request fails its own caller —
        tokenize/pack now run on the shared round thread, where an
        exception would fail every request of the round."""
        if not isinstance(text, str):
            raise ValueError(f"text must be a string, got {type(text).__name__}")
        labels = tuple(labels)
        if not labels or not all(isinstance(l, str) for l in labels):
            raise ValueError("labels must be a non-empty sequence of strings")
        req = _Request(text, labels, bool(prompt_first))
        with self._submit_lock:
            if not self._running:
                raise SchedulerClosed("scheduler is closed")
            try:
                self._q.put_nowait(req)
            except queue.Full:
                raise SchedulerOverloaded(
                    f"request queue full ({self._q.maxsize} pending)"
                ) from None
        return req.future

    def pending(self) -> int:
        """Current request-queue depth (observability: /metrics queue_depth).
        Approximate by nature (qsize races with the dispatcher) — good enough
        to see backlog building toward the max_pending backpressure limit."""
        return self._q.qsize()

    def close(self):
        """Stop the dispatcher and fail every request still in the queue.

        In-flight batches finish and fulfil their futures; queued-but-unstarted
        requests get :class:`SchedulerClosed` so callers blocked on
        ``future.result()`` wake immediately instead of hitting their timeout.
        The submit lock orders the flag flip before the drain: any submit that
        saw ``_running`` true has already enqueued, so the drain below sees it.
        """
        with self._submit_lock:
            self._running = False
        try:
            self._q.put(None, timeout=5)
        except queue.Full:
            pass  # loop is draining; it re-checks _running every batch
        # the tokenizer's finally pushes the plan sentinel; the dispatcher's
        # finally pushes the drain sentinel; the drainer finishes any
        # in-flight rounds (fulfilling their futures) then exits
        self._tokenizer_thread.join(timeout=30)
        self._thread.join(timeout=30)
        self._drainer.join(timeout=30)
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None and not r.future.done():
                r.future.set_exception(SchedulerClosed("scheduler closed"))

    # ------------------------------------------------------------------
    def _collect(self) -> list[_Request]:
        """Block for one request, then soak up to round_requests for
        max_wait_s."""
        first = self._q.get()
        if first is None:
            return []
        reqs = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(reqs) < self.round_requests:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                r = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if r is None:
                self._q.put(None)  # re-signal shutdown for the outer loop
                break
            reqs.append(r)
        return reqs

    def _tokenize_loop(self):
        """Stage 1: collect a round, encode it (GIL-releasing Rust calls),
        hand (reqs, enc) to the dispatcher. _encode_round isolates
        per-group failures; only a round-wide fault fails every request."""
        try:
            while self._running:
                reqs = self._collect()
                if not reqs:
                    break
                try:
                    kept, enc = self._encode_round(reqs)
                    if kept:
                        self._plan_q.put((kept, enc))
                except Exception as e:  # round-wide fault, keep the loop
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
        finally:
            self._plan_q.put(None)

    # bounded cache of per-label-set AffixEncoders (serving traffic is
    # typically a handful of label sets; evict wholesale if a tenant storm
    # produces unbounded variety)
    _AFFIX_CACHE_MAX = 64

    def _encode_round(
        self, reqs: "list[_Request]"
    ) -> "tuple[list[_Request], TokenizedBatch | None]":
        """Encode one round, grouped by (labels, prompt_first): each group
        with an EXACT AffixEncoder encodes its texts with the shared label
        block composed in (tokenization.AffixEncoder — the same fast path
        the batch pipeline uses, +6% measured there); groups whose
        tokenizer breaks the composition fall back to pack+encode
        (GLICLASS_TPU_AFFIX_TOKENIZE=0 forces the packed path for every
        group — the same kill switch as the batch pipeline). A group whose
        encode RAISES fails only its own requests; the rest of the round
        proceeds. Returns (surviving requests, round TokenizedBatch)."""
        import os

        from ..tokenization import AffixEncoder

        max_length = self.runtime.max_length
        affix_on = os.environ.get("GLICLASS_TPU_AFFIX_TOKENIZE", "1") != "0"
        groups: dict[tuple, list[int]] = {}
        for i, r in enumerate(reqs):
            groups.setdefault((r.labels, r.prompt_first), []).append(i)

        parts: list[tuple[list[int], TokenizedBatch]] = []
        for (labels, pf), idxs in groups.items():
            try:
                texts = [reqs[i].text for i in idxs]
                enc = self._affix_cache.get((labels, pf)) if affix_on else None
                if affix_on and enc is None:
                    if len(self._affix_cache) >= self._AFFIX_CACHE_MAX:
                        self._affix_cache.clear()
                    enc = AffixEncoder.for_labels(
                        self.tokenizer, labels, pf, max_length,
                        sample_text=texts[0],
                    )
                    self._affix_cache[(labels, pf)] = enc
                if affix_on and enc.exact:
                    tb = enc.encode_batch(texts, max_length)
                else:
                    tb = self.tokenizer.encode_batch(
                        [reqs[i].prompt for i in idxs], max_length,
                        pad_to=None,
                    )
                parts.append((idxs, tb))
            except Exception as e:  # isolate: fail only this group
                for i in idxs:
                    if not reqs[i].future.done():
                        reqs[i].future.set_exception(e)

        if not parts:
            return [], None
        if len(parts) == 1:
            idxs, tb = parts[0]
            return [reqs[i] for i in idxs], tb
        order = [i for idxs, _ in parts for i in idxs]
        pos = {req_i: row for row, req_i in enumerate(order)}
        n = len(order)
        target = max(tb.seq_length for _, tb in parts)
        ids = np.full((n, target), self.tokenizer.pad_token_id, dtype=np.int32)
        mask = np.zeros((n, target), dtype=np.int32)
        lengths = np.zeros((n,), dtype=np.int32)
        for idxs, tb in parts:
            L = tb.seq_length
            rows = np.asarray([pos[i] for i in idxs])
            ids[rows, :L] = tb.input_ids
            mask[rows, :L] = tb.attention_mask
            lengths[rows] = tb.lengths
        return [reqs[i] for i in order], TokenizedBatch(ids, mask, lengths)

    def _loop(self):
        """Stage 2: bucket + assemble + async dispatch; hand the in-flight
        round to the drainer."""
        try:
            while True:
                item = self._plan_q.get()
                if item is None:
                    break
                reqs, enc = item
                try:
                    planned = plan_from_encoded(
                        self.tokenizer, enc,
                        [r.num_labels for r in reqs], self.runtime,
                    )
                    maxw = max(r.num_labels for r in reqs)
                    failures: list[BatchFailure] = []
                    out = np.zeros((len(reqs), maxw), dtype=np.float32)
                    in_flight = dispatch_planned(
                        self.engine, planned, out, maxw, failures
                    )
                    self._drain_q.put((reqs, out, maxw, failures, in_flight))
                except Exception as e:  # fail this round, keep the loop
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
        finally:
            self._drain_q.put(None)

    def _drain_loop(self):
        """Second pipeline stage: wait out each round's device execution,
        transfer results, resolve its futures exactly once."""
        while True:
            item = self._drain_q.get()
            if item is None:
                break
            reqs, out, maxw, failures, in_flight = item
            try:
                _drain_in_flight(self.engine, in_flight, out, maxw, failures)
                failed = {
                    i: f.error for f in failures for i in f.indices
                }  # only the faulty batch's requests fail (post-retry)
                for i, r in enumerate(reqs):
                    if i in failed:
                        r.future.set_exception(RuntimeError(failed[i]))
                    else:
                        r.future.set_result(out[i, : r.num_labels])
            except Exception as e:  # fail every request of the round
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)
