"""ZeroShotClassificationPipeline: the user-facing end-to-end API.

Covers the reference's whole L5/L3 flow (main.c: parse job -> preprocess ->
infer -> postprocess -> report) as one object:

    pipe = ZeroShotClassificationPipeline.from_bundle("path/to/bundle")
    results = pipe(texts, labels, classification_type="multi-label")

plus ``classify_job`` for the reference's exact JSON job contract
(reference Readme.md:121-150) and a reference-format stdout report.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np

from .config import GLiClassConfig, RuntimeConfig
from .data import ClassificationJob
from .engine import InferenceEngine
from .parallel.scheduler import plan_and_run_overlapped, plan_batches, run_planned
from .postprocess import TextResult, decide_batch, format_report
from .prompting import pack_prompt, pack_prompts
from .tokenization import PromptTokenizer


@dataclass
class JobOutput:
    results: list[TextResult]
    probs: np.ndarray  # [num_texts, max_label_count] f32
    report: str
    timings: dict | None = None  # per-stage breakdown (utils.metrics)
    # Batches that failed after their one retry (SURVEY §5 job-level retry):
    # the affected texts' probability rows are 0 and their results carry no
    # decisions; everything else in the job is valid.
    failures: list = None  # list[parallel.scheduler.BatchFailure]

    @property
    def failed_indices(self) -> set[int]:
        return {i for f in (self.failures or []) for i in f.indices}

    def to_json(self) -> list[dict]:
        failed = self.failed_indices
        out = []
        for r in self.results:
            d = r.to_dict()
            if r.text_index in failed:
                d["error"] = next(
                    f.error for f in self.failures if r.text_index in f.indices
                )
            out.append(d)
        return out


class ZeroShotClassificationPipeline:
    def __init__(
        self,
        engine: InferenceEngine,
        tokenizer: PromptTokenizer,
        runtime: RuntimeConfig | None = None,
        prompt_first: bool | None = None,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.runtime = runtime or engine.runtime
        # prompt_first normally comes from the bundle config (the reference
        # reads it from the model's config.json via its launcher,
        # reference run_GLiClass.sh:84-89); CLI can override (main.c:67).
        self.prompt_first = (
            engine.cfg.prompt_first if prompt_first is None else prompt_first
        )

    @classmethod
    def from_bundle(
        cls,
        bundle_path: str,
        runtime: RuntimeConfig | None = None,
        mesh=None,
        prompt_first: bool | None = None,
    ) -> "ZeroShotClassificationPipeline":
        from .convert import bundle as B

        engine = InferenceEngine.from_bundle(bundle_path, runtime, mesh)
        tokenizer = PromptTokenizer.from_file(B.tokenizer_path(bundle_path))
        return cls(engine, tokenizer, runtime, prompt_first)

    # ------------------------------------------------------------------
    def predict_probs(
        self,
        texts: Sequence[str],
        labels: Sequence[Sequence[str]],
        same_labels: bool,
        timer=None,
        failures: list | None = None,
    ) -> np.ndarray:
        """[num_texts, max_label_count] per-label probabilities.

        ``failures``: optional list collecting per-batch BatchFailure records
        (one retry per failed batch first); without it a persistent batch
        failure raises."""
        from .utils.metrics import StageTimer

        timer = timer if timer is not None else StageTimer()
        counts = [
            len(labels[0]) if same_labels else len(labels[i])
            for i in range(len(texts))
        ]
        cap = self.engine.cfg.max_num_classes
        if cap and max(counts) > cap:
            # The bundle records the model's trained label capacity
            # (gliclass-package max_num_classes); beyond it scores are
            # untrained-garbage. The reference never checks (its batch
            # binary silently scores any label list), so the batch path
            # WARNS instead of erroring — behavior parity with a visible
            # quality signal; the serving path hard-errors (serving.py).
            import warnings

            warnings.warn(
                f"{max(counts)} labels exceeds the model's max_num_classes "
                f"({cap}); scores beyond the trained capacity are unreliable "
                f"— split the label set across requests",
                stacklevel=3,
            )
        if self.runtime.overlap_enabled():
            # Tokenization AND prompt packing overlap device execution: each
            # chunk is packed lazily inside the tokenize stream (producer
            # thread), so the packing pass (~34 ms serial for a 4096-text
            # job) hides under device time like tokenization does. The same
            # timer receives the host-side attribution of the streamed plan
            # (h_tokenize / h_dispatch / h_drain sub-stages).
            pf = self.prompt_first

            def pack_chunk(lo: int, hi: int):
                return pack_prompts(
                    texts[lo:hi],
                    labels if same_labels else labels[lo:hi],
                    same_labels,
                    pf,
                )

            import os

            encode_chunk_fn = None
            if (
                same_labels
                and texts
                and os.environ.get("GLICLASS_TPU_AFFIX_TOKENIZE", "1") != "0"
            ):
                # Same-labels fast path: the shared label block is encoded
                # ONCE per job (tokenization.AffixEncoder) instead of once
                # per text; composition is verified against a full-string
                # encode of the first prompt and falls back to pack+encode
                # if the tokenizer breaks the identity.
                from .tokenization import AffixEncoder

                enc = AffixEncoder.for_labels(
                    self.tokenizer, labels[0], pf, self.runtime.max_length,
                    sample_text=texts[0],
                )
                if enc.exact:
                    def encode_chunk_fn(lo: int, hi: int, _enc=enc):
                        return _enc.encode_batch(
                            texts[lo:hi], self.runtime.max_length
                        )

            with timer.stage("tokenize_device"):
                probs = plan_and_run_overlapped(
                    self.engine, self.tokenizer, None, counts, self.runtime,
                    len(texts), max(counts), failures=failures, timer=timer,
                    pack_fn=pack_chunk, encode_chunk_fn=encode_chunk_fn,
                )
        else:
            with timer.stage("pack"):
                prompts = pack_prompts(texts, labels, same_labels, self.prompt_first)
            with timer.stage("tokenize_plan"):
                planned = plan_batches(self.tokenizer, prompts, counts, self.runtime)
            with timer.stage("device"):
                probs = run_planned(
                    self.engine, planned, len(texts), max(counts),
                    failures=failures,
                )
        timer.add_count("texts", len(texts))
        return probs

    def __call__(
        self,
        texts: Sequence[str] | str,
        labels: Sequence[Sequence[str]] | Sequence[str],
        classification_type: str = "multi-label",
        threshold: float | None = None,
    ) -> list[TextResult]:
        """gliclass-package-style API: shared label list, or one list per text."""
        if isinstance(texts, str):
            texts = [texts]
        same_labels = bool(labels) and isinstance(labels[0], str)
        if same_labels:
            labels = [list(labels)]
        probs = self.predict_probs(texts, labels, same_labels)
        counts = [
            len(labels[0]) if same_labels else len(labels[i])
            for i in range(len(texts))
        ]
        return decide_batch(
            probs,
            texts,
            labels,
            same_labels,
            classification_type,
            self.runtime.threshold if threshold is None else threshold,
            num_valid=counts,
            use_native=self.runtime.use_native_host_ops,
        )

    # ------------------------------------------------------------------
    def classify_job(self, job: ClassificationJob) -> JobOutput:
        """The reference CLI contract end-to-end (reference main.c:116-155)."""
        from .utils.metrics import StageTimer

        timer = StageTimer()
        failures: list = []
        probs = self.predict_probs(
            job.texts, job.labels, job.same_labels, timer, failures=failures
        )
        counts = [len(job.labels_for(i)) for i in range(job.num_texts)]
        with timer.stage("decide"):
            results = decide_batch(
                probs,
                job.texts,
                job.labels,
                job.same_labels,
                job.classification_type,
                self.runtime.threshold,
                num_valid=counts,
                use_native=self.runtime.use_native_host_ops,
            )
        return JobOutput(
            results, probs, format_report(results), timer.to_dict(),
            failures=failures,
        )
