"""The accuracy north star: INT8 micro-F1 within 0.5% of fp32 (BASELINE.md).

A random-init tiny model cannot gate this meaningfully — its input-driven
logit spread is the same order as the quantization error, so any threshold
near the probability mass flips a large fraction of decisions. Instead the
fixture TRAINS the tiny torch reference on the synthetic signature-word set
for a few seconds (deterministic seeds), giving a real bimodal probability
distribution; the gate then measures how many decisions INT8 actually flips,
exactly as it would on a published trained checkpoint.

The reference gates its quantized model at logit atol 1e-3 on one sample
(reference ONNX_CONVERTING/test_onnx.py:48-51,72-74); this is the F1-level
generalization BASELINE.md demands.
"""

import os

import numpy as np
import pytest

from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig, RuntimeConfig
from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline
from gliclass.c_tpu.utils.eval import int8_f1_gate, synthetic_eval_set


@pytest.fixture(scope="module")
def trained_bundle(tiny_tokenizer_file, tmp_path_factory):
    import torch

    from gliclass.c_tpu.convert.convert import export_bundle
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass
    from gliclass.c_tpu.prompting import pack_prompts
    from gliclass.c_tpu.tokenization import PromptTokenizer

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
    model = build_torch_gliclass(cfg)  # seeds torch

    texts, labels, refs = synthetic_eval_set(256, seed=1)  # train != eval split
    prompts = pack_prompts(texts, [labels], True, True)
    batch = tok.encode_batch(prompts, max_length=64, pad_to=64)
    ids = torch.tensor(batch.input_ids.astype(np.int64))
    mask = torch.tensor(batch.attention_mask.astype(np.int64))
    targets = torch.tensor(
        [[1.0 if l in r else 0.0 for l in labels] for r in refs],
        dtype=torch.float32,
    )
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    model.train()
    g = torch.Generator().manual_seed(0)
    for _ in range(80):
        perm = torch.randperm(len(texts), generator=g)[:64]
        logits, _ = model(ids[perm], mask[perm], max_labels=len(labels))
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            logits, targets[perm]
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()

    path = str(tmp_path_factory.mktemp("f1bundle") / "trained")
    export_bundle(model, cfg, tok, path, quantize=True)
    return path


RT = dict(
    compute_dtype="float32", max_length=64, seq_buckets=(64,),
    label_buckets=(4,), batch_size=32,
)


def test_int8_f1_gate_within_half_percent(trained_bundle):
    pipe32 = ZeroShotClassificationPipeline.from_bundle(
        trained_bundle, RuntimeConfig(quant_mode="none", **RT)
    )
    pipe8 = ZeroShotClassificationPipeline.from_bundle(
        trained_bundle, RuntimeConfig(quant_mode="int8", **RT)
    )
    gate = int8_f1_gate(pipe32, pipe8, n_texts=512, threshold=0.5, seed=0)

    # The gate itself (BASELINE.md accuracy north star).
    assert gate["delta"] <= 0.005, gate

    # Guards that the gate is NOT trivially green:
    # 1. decisions straddle the threshold (a degenerate all-positive or
    #    all-negative set would pass under any quantization error)
    assert 0 < gate["positives_fp32"] < gate["cells"], gate
    # 2. INT8 actually executed quantized math — bit-identical probabilities
    #    would mean the quantized weights were silently never used
    #    (the round-1 failure mode).
    assert gate["max_prob_delta"] > 0, gate
    # 3. the trained model is better than chance, so F1 measures signal
    assert gate["f1_fp32"] > 0.3, gate


def test_selftest_cli_int8_runs_gate(trained_bundle, capsys):
    from gliclass.c_tpu.cli import main

    rc = main([
        "selftest", "--bundle", trained_bundle, "--dtype", "float32",
        "--max-length", "64", "--int8",
    ])
    out = capsys.readouterr().out
    assert "int8 F1 gate:" in out and "delta=" in out
    assert rc == 0, out
