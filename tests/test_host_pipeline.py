"""Unit tests for the host-side pipeline stages: ingest, prompt packing,
tokenization, decisions. These lock in reference-parity semantics
(SURVEY §4: "pytest units per stage")."""

import json

import numpy as np
import pytest

from gliclass.c_tpu import prompting
from gliclass.c_tpu.data import (
    ClassificationJob,
    JobParseError,
    load_job,
    parse_job,
    string_to_bool,
)
from gliclass.c_tpu.postprocess import (
    UNKNOWN_LABEL,
    decide_batch,
    decide_row,
    format_report,
)
from gliclass.c_tpu.tokenization import PromptTokenizer

README_JOB = {
    "texts": [
        "ONNX is an open-source format designed to enable the interoperability of AI models.",
        "Why are you running?",
        "Support Ukraine",
    ],
    "labels": [["format", "model", "tool", "necessity"]],
    "same_labels": True,
    "classification_type": "multi-label",
}


class TestIngest:
    def test_shared_labels(self):
        job = parse_job(README_JOB)
        assert job.num_texts == 3
        assert job.same_labels
        assert job.labels_for(2) == ("format", "model", "tool", "necessity")

    def test_per_text_labels(self):
        job = parse_job(
            {
                "texts": ["a", "b"],
                "labels": [["x", "y"], ["z"]],
                "same_labels": False,
                "classification_type": "single-label",
            }
        )
        assert job.labels_for(0) == ("x", "y")
        assert job.labels_for(1) == ("z",)

    def test_per_text_count_mismatch(self):
        # reference src/read_data.c:106-143 checks labels count vs texts count
        with pytest.raises(JobParseError):
            parse_job(
                {
                    "texts": ["a", "b", "c"],
                    "labels": [["x"], ["y"]],
                    "same_labels": False,
                    "classification_type": "multi-label",
                }
            )

    def test_bad_classification_type(self):
        bad = dict(README_JOB, classification_type="zero-shot")
        with pytest.raises(JobParseError):
            parse_job(bad)

    def test_load_job_file(self, tmp_path):
        p = tmp_path / "job.json"
        p.write_text(json.dumps(README_JOB))
        job = load_job(str(p))
        assert isinstance(job, ClassificationJob)
        assert job.classification_type == "multi-label"

    def test_string_to_bool(self):
        # reference src/read_data.c:160-169
        assert string_to_bool("true") and string_to_bool("1")
        assert not string_to_bool("false") and not string_to_bool("0")
        with pytest.raises(ValueError):
            string_to_bool("yes")


class TestPromptPacking:
    def test_prompt_first(self):
        # reference src/preprocessor.c:84-95
        s = prompting.pack_prompt("Hello World", ["Cat", "DOG"], prompt_first=True)
        assert s == "<<LABEL>>cat<<LABEL>>dog<<SEP>>Hello World"

    def test_prompt_last(self):
        # reference src/preprocessor.c:96-108
        s = prompting.pack_prompt("Hello", ["A"], prompt_first=False)
        assert s == "Hello<<LABEL>>a<<SEP>>"

    def test_ascii_only_lowercasing(self):
        # C tolower touches only ASCII; É must NOT become é
        # (reference src/preprocessor.c:88-93 uses byte-wise tolower)
        s = prompting.pack_prompt("t", ["Élan VITAL"], prompt_first=True)
        assert s == "<<LABEL>>Élan vital<<SEP>>t"

    def test_batch_shared_vs_per_text(self):
        # labels[0] when same_labels else labels[i] (reference src/preprocessor.c:33-38)
        shared = prompting.pack_prompts(["t1", "t2"], [["L"]], True, True)
        assert shared == ["<<LABEL>>l<<SEP>>t1", "<<LABEL>>l<<SEP>>t2"]
        per = prompting.pack_prompts(["t1", "t2"], [["A"], ["B"]], False, True)
        assert per == ["<<LABEL>>a<<SEP>>t1", "<<LABEL>>b<<SEP>>t2"]

    def test_empty_labels(self):
        assert prompting.pack_prompt("x", [], True) == "<<SEP>>x"


class TestTokenization:
    def test_special_tokens_resolve(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        assert tok.label_token_id is not None
        assert tok.sep_token_id is not None
        assert tok.label_token_id != tok.sep_token_id

    def test_label_tokens_are_atomic(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        prompt = prompting.pack_prompt("the dog", ["cat", "dog"], True)
        batch = tok.encode_batch([prompt], max_length=64)
        ids = batch.input_ids[0][batch.attention_mask[0] == 1]
        assert int(np.sum(ids == tok.label_token_id)) == 2
        assert int(np.sum(ids == tok.sep_token_id)) == 1

    def test_pad_to_batch_max_reference_mode(self, tiny_tokenizer_file):
        # pad_to=None reproduces reference pad-to-batch-max (src/tokenizer.c:44-54)
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        batch = tok.encode_batch(["the dog", "the quick brown fox jumps"], max_length=64)
        assert batch.seq_length == int(batch.lengths.max())
        # shorter row is padded with mask 0
        assert batch.attention_mask[0, -1] == 0

    def test_truncation(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        long_text = "the quick brown fox " * 50
        batch = tok.encode_batch([long_text], max_length=16)
        assert batch.seq_length == 16
        assert batch.lengths[0] == 16
        assert batch.attention_mask[0].sum() == 16

    def test_bucket_padding(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        batch = tok.encode_batch(["the dog"], max_length=64, pad_to=32)
        assert batch.seq_length == 32
        np.testing.assert_array_equal(
            batch.input_ids[0][batch.lengths[0]:],
            np.full(32 - batch.lengths[0], tok.pad_token_id),
        )

    def test_bucket_too_small_raises(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        with pytest.raises(ValueError):
            tok.encode_batch(["the quick brown fox jumps over the lazy dog"], max_length=64, pad_to=2)

    def test_parallel_matches_serial(self, tiny_tokenizer_file):
        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        prompts = [f"the quick brown fox {i}" for i in range(40)]
        a = tok.encode_batch(prompts, max_length=32, pad_to=32)
        b = tok.encode_batch_parallel(prompts, max_length=32, pad_to=32, chunk_size=7)
        np.testing.assert_array_equal(a.input_ids, b.input_ids)
        np.testing.assert_array_equal(a.attention_mask, b.attention_mask)


class TestDecisions:
    def test_multi_label_strict_threshold(self):
        # prob > threshold strictly (reference src/postprocessor.c:95)
        logits = np.array([0.0, 5.0, -5.0])  # sigmoid: .5, .993, .0067
        probs = 1 / (1 + np.exp(-logits))
        out = decide_row(probs, ["a", "b", "c"], "multi-label", threshold=0.5)
        assert [d.label for d in out] == ["b"]
        assert out[0].index == 1

    def test_single_label_first_max_wins(self):
        # strict > scan -> first maximum wins ties (reference src/postprocessor.c:122-127)
        probs = np.array([0.9, 0.9, 0.1], dtype=np.float32)
        out = decide_row(probs, ["a", "b", "c"], "single-label", threshold=0.5)
        assert len(out) == 1 and out[0].label == "a" and out[0].index == 0

    def test_single_label_ignores_threshold(self):
        probs = np.array([0.1, 0.2], dtype=np.float32)
        out = decide_row(probs, ["a", "b"], "single-label", threshold=0.99)
        assert out[0].label == "b"

    def test_unknown_fallback(self):
        # column beyond label list -> "[Unknown]" (reference src/postprocessor.c:107-111)
        probs = np.array([0.1, 0.9], dtype=np.float32)
        out = decide_row(probs, ["only"], "multi-label", threshold=0.5)
        assert out[0].label == UNKNOWN_LABEL and out[0].index == 1

    def test_num_valid_masks_padded_slots(self):
        probs = np.array([0.6, 0.99], dtype=np.float32)
        out = decide_row(probs, ["a"], "multi-label", threshold=0.5, num_valid=1)
        assert [d.label for d in out] == ["a"]

    def test_unsupported_type(self):
        with pytest.raises(ValueError):
            decide_row(np.array([0.5]), ["a"], "ranked", 0.5)

    def test_batch_shared_label_lookup(self):
        probs = np.array([[0.9, 0.1], [0.1, 0.9]], dtype=np.float32)
        res = decide_batch(
            probs, ["t0", "t1"], [["x", "y"]], True, "single-label", 0.5
        )
        assert res[0].decisions[0].label == "x"
        assert res[1].decisions[0].label == "y"

    def test_report_format(self):
        probs = np.array([[0.9]], dtype=np.float32)
        res = decide_batch(probs, ["hello"], [["x"]], True, "multi-label", 0.5)
        rep = format_report(res)
        # line format matches reference printf (src/postprocessor.c:90,108-110)
        assert rep == "Text_0: hello:\n  Text_0 Label: x, Score: 0.900000\n\n"


class TestAffixEncoder:
    """Same-labels fast path: the shared label block encoded once per job,
    composed per text — ids must EQUAL the full-string encode (r5)."""

    def _make(self, tiny_tokenizer_file, texts, labels, pf, max_length=64):
        from gliclass.c_tpu.prompting import pack_prompt
        from gliclass.c_tpu.tokenization import AffixEncoder, PromptTokenizer

        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        affix = pack_prompt("", labels, pf)
        prefix, suffix = (affix, "") if pf else ("", affix)
        enc = AffixEncoder(
            tok, prefix, suffix, validate_text=texts[0],
            validate_prompt=pack_prompt(texts[0], labels, pf),
            max_length=max_length,
        )
        return tok, enc

    @pytest.mark.parametrize("pf", [True, False])
    def test_composed_equals_full_encode(self, tiny_tokenizer_file, pf):
        from gliclass.c_tpu.prompting import pack_prompt

        texts = [
            "the quick brown fox",
            "why are you running",
            "",  # empty text
            "support ukraine " * 3,
        ]
        labels = ["science", "sports", "format"]
        tok, enc = self._make(tiny_tokenizer_file, texts, labels, pf)
        assert enc.exact, enc._why
        fast = enc.encode_batch(texts, max_length=64, pad_to=64)
        full = tok.encode_batch(
            [pack_prompt(t, labels, pf) for t in texts],
            max_length=64, pad_to=64,
        )
        np.testing.assert_array_equal(fast.input_ids, full.input_ids)
        np.testing.assert_array_equal(fast.attention_mask, full.attention_mask)
        np.testing.assert_array_equal(fast.lengths, full.lengths)

    def test_truncation_matches(self, tiny_tokenizer_file):
        from gliclass.c_tpu.prompting import pack_prompt

        texts = ["the quick brown fox jumps over the lazy dog " * 8]
        labels = ["science", "sports"]
        tok, enc = self._make(tiny_tokenizer_file, texts, labels, True,
                              max_length=24)
        assert enc.exact
        fast = enc.encode_batch(texts, max_length=24, pad_to=24)
        full = tok.encode_batch(
            [pack_prompt(t, labels, True) for t in texts],
            max_length=24, pad_to=24,
        )
        np.testing.assert_array_equal(fast.input_ids, full.input_ids)
        assert int(fast.lengths[0]) == 24

    def test_inexact_falls_back(self, tiny_tokenizer_file):
        from gliclass.c_tpu.prompting import pack_prompt
        from gliclass.c_tpu.tokenization import PromptTokenizer

        tok, enc = self._make(
            tiny_tokenizer_file, ["abc"], ["science"], True
        )
        enc.exact = False  # simulate a tokenizer that breaks composition
        with pytest.raises(ValueError, match="fallback_prompts"):
            enc.encode_batch(["abc"], max_length=64)
        prompts = [pack_prompt("abc", ["science"], True)]
        out = enc.encode_batch(["abc"], max_length=64,
                               fallback_prompts=prompts)
        full = tok.encode_batch(prompts, max_length=64)
        np.testing.assert_array_equal(out.input_ids, full.input_ids)

    def test_for_labels_nonvacuous_with_empty_sample(self, tiny_tokenizer_file):
        """An empty (or truncating) first text must not make validation
        vacuous: for_labels always also validates the fixed non-empty probe
        untruncated (review finding r5)."""
        from gliclass.c_tpu.prompting import pack_prompt
        from gliclass.c_tpu.tokenization import AffixEncoder, PromptTokenizer

        tok = PromptTokenizer.from_file(tiny_tokenizer_file)
        labels = ["science", "sports"]
        enc = AffixEncoder.for_labels(tok, labels, True, max_length=8,
                                      sample_text="")
        # tiny tokenizer composes exactly -> certified even with max_length=8
        assert enc.exact
        texts = ["the quick brown fox", ""]
        fast = enc.encode_batch(texts, max_length=8, pad_to=8)
        full = tok.encode_batch(
            [pack_prompt(t, labels, True) for t in texts], max_length=8,
            pad_to=8,
        )
        np.testing.assert_array_equal(fast.input_ids, full.input_ids)

    def test_for_labels_rejects_position_dependent_tokenizer(self, tmp_path):
        """A ByteLevel(add_prefix_space=True) tokenizer breaks the
        composition at the affix/text boundary; for_labels must detect it
        via the probe and refuse the fast path."""
        import string as _string

        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        from gliclass.c_tpu.tokenization import AffixEncoder, PromptTokenizer

        t = Tokenizer(models.BPE(unk_token="[UNK]"))
        t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
        trainer = trainers.BpeTrainer(
            vocab_size=400,
            special_tokens=["[PAD]", "[UNK]", "<<LABEL>>", "<<SEP>>"],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        )
        t.train_from_iterator(
            ["probe boundary text science sports", _string.ascii_lowercase],
            trainer,
        )
        tok = PromptTokenizer(t, pad_token_id=0)
        enc = AffixEncoder.for_labels(tok, ["science"], True, max_length=64)
        # prompt_first composition inserts the text mid-string; with
        # add_prefix_space the standalone encode differs -> must NOT certify
        if enc.exact:
            # if this tokenizer happens to compose exactly, the invariant
            # still holds — but then composed must equal full encode
            from gliclass.c_tpu.prompting import pack_prompt

            fast = enc.encode_batch(["probe boundary text"], 64, pad_to=64)
            full = tok.encode_batch(
                [pack_prompt("probe boundary text", ["science"], True)],
                64, pad_to=64,
            )
            np.testing.assert_array_equal(fast.input_ids, full.input_ids)
