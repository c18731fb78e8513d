"""Shared test utilities: offline tokenizer construction, tiny configs."""

from __future__ import annotations

import string


def build_tiny_tokenizer(path: str) -> None:
    """Build a small but real tokenizer.json: byte-level BPE over ASCII with the
    GLiClass special tokens (<<LABEL>>, <<SEP>>) and BERT-style specials.

    Uses the HF `tokenizers` library (the same Rust core the reference consumes
    through tokenizers-cpp; reference src/tokenizer.c:19-91) so test tokenization
    behaves like production tokenization.
    """
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=512,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "<<LABEL>>", "<<SEP>>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "onnx is an open-source format for ai models",
        "why are you running",
        "support ukraine",
        "science business sports politics travel health",
        string.ascii_lowercase,
        " ".join(str(i) for i in range(10)),
    ]
    tok.train_from_iterator(corpus, trainer)
    cls_id = tok.token_to_id("[CLS]")
    sep_id = tok.token_to_id("[SEP]")
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    tok.save(path)
