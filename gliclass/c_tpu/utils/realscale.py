"""Real-scale bench artifact: a fetch-shaped bundle at gliclass-base-v1.0
geometry.

The bench previously measured a 512-vocab toy tokenizer with weights held
outside any bundle — honest about step geometry, but never produced for an
artifact shaped like what ``fetch`` emits (reference run_GLiClass.sh:33-92
always runs the real artifact). This module builds, once, a cached artifact
shaped exactly like a fetched-and-converted knowledgator/gliclass-base-v1.0
checkpoint:

  * a 128,100-piece byte-level BPE tokenizer TRAINED OFFLINE over local text
    (this environment has no hub access; the real checkpoint's
    DeBERTa-v3 tokenizer has vocab_size 128,100 — matching the piece count
    reproduces the real merge-table size, hence the real host-side tokenize
    cost, and a realistic ~1 token/word English segmentation);
  * the full-geometry torch reference model (186M params: 128,100 x 768
    embedding table resident in HBM), randomly initialized (no network),
    exported through the REAL converter path — state-dict conversion, golden
    logits, INT8 quantization, safetensors bundle (convert/convert.py
    export_bundle);
  * bench/selftest then load it exactly like a fetched checkpoint
    (pipeline.from_bundle), so the measured numbers include bundle IO,
    real-vocab tokenization and full embedding-table HBM residency.
"""

from __future__ import annotations

import os
import sys

REALSCALE_VOCAB = 128100  # vocab_size of microsoft/deberta-v3-base (and the
# gliclass-{small,base,large}-v1.0 checkpoints built on it)

_SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "<<LABEL>>", "<<SEP>>"]


def _corpus_files(max_bytes: int) -> list[str]:
    """Local text corpus: Python/doc sources from site-packages (the only
    large text reservoir in this offline image). Deterministic order."""
    import glob

    roots = [os.path.dirname(os.path.dirname(os.__file__))]
    try:
        import numpy

        roots.append(os.path.dirname(os.path.dirname(numpy.__file__)))
    except Exception:
        pass
    files: list[str] = []
    total = 0
    for root in roots:
        for ext in ("py", "txt", "md", "rst"):
            for f in sorted(glob.glob(f"{root}/**/*.{ext}", recursive=True)):
                try:
                    sz = os.path.getsize(f)
                except OSError:
                    continue
                if sz < 256:
                    continue
                files.append(f)
                total += sz
                if total >= max_bytes:
                    return files
    return files


def build_realscale_tokenizer(
    path: str, vocab_size: int = REALSCALE_VOCAB, max_mb: int = 96
) -> None:
    """Train and save a byte-level BPE tokenizer.json with ``vocab_size``
    pieces (same Rust trainer the production tokenizers were built with)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers

    files = _corpus_files(max_mb * 1024 * 1024)

    def lines():
        for f in files:
            try:
                with open(f, errors="ignore") as fh:
                    yield fh.read()
            except OSError:
                continue

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=_SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(lines(), trainer)
    cls_id = tok.token_to_id("[CLS]")
    sep_id = tok.token_to_id("[SEP]")
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tok.save(path)


QWEN_VOCAB = 151936  # vocab_size of Qwen/Qwen2-1.5B (gliclass-qwen-1.5B)
LLAMA_VOCAB = 32000  # vocab_size of Sheared-LLaMA-1.3B (gliclass-llama-1.3B)


def ensure_realscale_bundle(
    root: str | None = None, log=None, variant: str = "base"
) -> str:
    """Build (once) and return the path of the real-scale bundle.

    ``variant``: "base" = knowledgator/gliclass-base-v1.0 geometry (186M,
    DeBERTa-v3-base backbone); "qwen" = gliclass-qwen-1.5B-v1.0 geometry
    (1.5B, Qwen2-1.5B decoder backbone with its own 151,936-piece BPE);
    "llama" = gliclass-llama-1.3B-v1.0 geometry (Sheared-LLaMA-1.3B
    backbone, 32,000-piece BPE) — the decoder-backbone artifacts the
    reference cannot load at all (reference Readme.md:91-95).

    Cached under GLICLASS_REALSCALE_DIR (default ~/.cache/gliclass_realscale);
    subsequent calls return instantly. The build runs the full converter:
    torch reference model -> convert_gliclass_state_dict -> goldens ->
    INT8 quantization -> safetensors bundle."""
    log = log or (lambda m: print(m, file=sys.stderr, flush=True))
    # The build is host-side (torch + numpy quantization); force local CPU so
    # a build triggered from a non-TPU process can never contend for the
    # single-tenant chip (this container's sitecustomize registers the remote
    # TPU plugin in EVERY python process, and its config beats JAX_PLATFORMS).
    import jax
    from jax._src import xla_bridge

    if not xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
    root = root or os.environ.get(
        "GLICLASS_REALSCALE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gliclass_realscale"),
    )
    assert variant in ("base", "small", "large", "qwen", "llama"), variant
    sub = "" if variant == "base" else variant
    bundle = os.path.join(root, sub, "bundle") if sub else os.path.join(root, "bundle")
    done = os.path.join(bundle, ".complete")
    if os.path.exists(done):
        return bundle

    import torch

    from ..config import (
        GLiClassConfig,
        deberta_v3_config,
        llama_config,
        qwen2_config,
    )
    from ..convert.convert import export_bundle
    from ..convert.torch_ref import build_torch_gliclass
    from ..tokenization import PromptTokenizer

    if variant == "qwen":
        vocab = QWEN_VOCAB
        tok_path = os.path.join(root, sub, "tokenizer.json")
        backbone = qwen2_config("1.5b")
        name = ("knowledgator/gliclass-qwen-1.5B-v1.0 (geometry; offline "
                "random init — no hub access in this environment)")
        hidden = backbone.hidden_size
    elif variant == "llama":
        vocab = LLAMA_VOCAB
        tok_path = os.path.join(root, sub, "tokenizer.json")
        backbone = llama_config("1.3b")
        name = ("knowledgator/gliclass-llama-1.3B-v1.0 (geometry; offline "
                "random init — no hub access in this environment)")
        hidden = backbone.hidden_size
    elif variant in ("small", "large"):
        # gliclass-{small,large}-v1.0 share the DeBERTa-v3 128,100-piece
        # vocab — reuse the base artifact's tokenizer (one build total).
        vocab = REALSCALE_VOCAB
        tok_path = os.path.join(root, "tokenizer.json")
        backbone = deberta_v3_config(variant)
        name = (f"knowledgator/gliclass-{variant}-v1.0 (geometry; offline "
                "random init — no hub access in this environment)")
        hidden = backbone.hidden_size
    else:
        vocab = REALSCALE_VOCAB
        tok_path = os.path.join(root, "tokenizer.json")
        backbone = deberta_v3_config("base")
        name = ("knowledgator/gliclass-base-v1.0 (geometry; offline random "
                "init — no hub access in this environment)")
        hidden = 768
    if not os.path.exists(tok_path):
        log(f"[realscale] training {vocab}-piece BPE tokenizer "
            "(one-time, a few minutes)...")
        # small/large REUSE the base tokenizer artifact, so its training
        # corpus size must not depend on which variant builds it first
        deberta_family = variant in ("base", "small", "large")
        build_realscale_tokenizer(tok_path, vocab_size=vocab,
                                  max_mb=96 if deberta_family else 160)

    log(f"[realscale] building torch reference model at {variant} geometry...")
    ptok = PromptTokenizer.from_file(tok_path)
    cfg = GLiClassConfig(
        original_model_name=name,
        hidden_size=hidden,
        prompt_first=True,
        class_token_index=ptok.label_token_id,
        text_token_index=ptok.sep_token_id,
        backbone=backbone,
    )
    assert cfg.backbone.vocab_size == vocab, cfg.backbone.vocab_size
    torch.manual_seed(0)
    model = build_torch_gliclass(cfg, seed=0)
    log("[realscale] exporting bundle (convert + goldens + INT8)...")
    export_bundle(
        model,
        cfg,
        ptok,
        bundle,
        quantize=True,
        golden_samples=[
            (
                ["ONNX is an open-source format designed to enable the "
                 "interoperability of AI models across various frameworks "
                 "and tools."],
                [["format", "model", "tool", "cat"]],
                True,
            ),
            (
                ["the quick brown fox jumps over the lazy dog",
                 "open source ai frameworks run fast on accelerators"],
                [["animal", "science", "sports"]],
                True,
            ),
        ],
    )
    with open(done, "w") as f:
        f.write("ok")
    log(f"[realscale] bundle ready at {bundle}")
    return bundle
