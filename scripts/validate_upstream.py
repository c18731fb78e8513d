#!/usr/bin/env python
"""First-network-run validation: prove the reconstructed head == upstream.

The ONE epistemic gap this repo cannot close offline (PARITY.md "upstream
truth"): the reference toolchain imports the real ``gliclass`` package
(reference ONNX_CONVERTING/convert_to_onnx.py:48-62), while this repo's golden
chain validates the JAX engine against ``convert/torch_ref.py`` — an
independent RECONSTRUCTION of that package's head. Goldens therefore prove
JAX == reconstruction, not JAX == upstream. This script is the ready-to-run
closure for the first environment WITH network access:

  stage A  pip-install the pinned ``gliclass`` package (+ ``datasets``)
  stage B  diff ``torch_ref`` against the package forward over the head-config
           matrix (scorer x pooling x extract_text_features x squeeze_layers x
           use_lstm), random weights copied upstream -> reconstruction via the
           production ``load_checkpoint_state_dict`` loader, fixed seeds
  stage C  fetch knowledgator/gliclass-base-v1.0 through the production
           ``ensure_bundle`` path, then golden-selftest it (fp32 atol 1e-3 and
           int8-dynamic at the derived 0.15 gate)
  stage D  micro-F1 gate on a REAL eval set (sst2 via ``datasets``): fp32 vs
           int8-dynamic delta <= 0.5% (BASELINE.md accuracy target), plus
           upstream-package agreement on the same texts

In an offline environment every network-touching stage prints ``SKIP`` with
the reason and the script exits 0 (clean skip at the network boundary — the
point is that it is ready, not that it can run here). A real numeric mismatch
anywhere exits 1 with per-combo diagnostics. With an EXPLICIT ``--stage``,
a stage that skipped (network/package unavailable) exits 3 — CI keyed on a
requested stage can tell "never ran" from "ran and passed".

Usage:  python scripts/validate_upstream.py [--model knowledgator/gliclass-base-v1.0]
        [--stage A|B|C|D]  (default: all stages in order)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Pin the upstream package version this script was written against; bump
# deliberately (API drift in the package is exactly what stage B detects).
GLICLASS_PIN = "gliclass==0.1.8"
DEFAULT_MODEL = "knowledgator/gliclass-base-v1.0"


def log(msg: str) -> None:
    print(f"[validate_upstream] {msg}", flush=True)


class NetworkUnavailable(Exception):
    pass


def _probe_network(timeout: float = 5.0) -> None:
    """Raise NetworkUnavailable if the HF/pypi network boundary is closed."""
    import socket

    for host in ("pypi.org", "huggingface.co"):
        try:
            socket.create_connection((host, 443), timeout=timeout).close()
            return
        except OSError:
            continue
    raise NetworkUnavailable("cannot reach pypi.org or huggingface.co:443")


# ---------------------------------------------------------------------------
# stage A: install the upstream package
# ---------------------------------------------------------------------------
def stage_a() -> bool:
    try:
        import gliclass as up  # noqa: F401  (the UPSTREAM package)

        # Both the upstream package and this repo's namespace are importable
        # as "gliclass"; ours has no GLiClassModel at top level, theirs does.
        if hasattr(up, "GLiClassModel"):
            log("stage A: upstream gliclass package already importable — OK")
            return True
    except ImportError:
        pass
    _probe_network()
    log(f"stage A: pip install {GLICLASS_PIN} datasets ...")
    subprocess.run(
        [sys.executable, "-m", "pip", "install", GLICLASS_PIN, "datasets"],
        check=True,
    )
    return True


def _import_upstream():
    """Import the UPSTREAM ``gliclass`` package alongside this repo's
    same-named namespace.

    Both share the top-level name. Strategy: snapshot-and-evict every
    ``gliclass*`` entry from ``sys.modules``, import the upstream package
    with the repo off ``sys.path``, keep a direct object reference to it,
    then evict ITS entries and restore the snapshot — afterwards normal
    imports resolve to the repo again while the returned module object keeps
    the upstream alive. Call-sites must import repo modules normally and use
    the returned object for everything upstream."""
    import importlib

    saved_path = list(sys.path)
    saved_mods = {
        m: sys.modules[m]
        for m in list(sys.modules)
        if m.split(".")[0] == "gliclass"
    }
    try:
        for m in saved_mods:
            del sys.modules[m]
        sys.path = [p for p in sys.path if os.path.abspath(p or ".") != REPO]
        up = importlib.import_module("gliclass")
        if not hasattr(up, "GLiClassModel"):
            raise ImportError(
                "imported 'gliclass' has no GLiClassModel — the repo "
                "namespace shadowed the upstream package (is it installed?)"
            )
        return up
    finally:
        sys.path = saved_path
        for m in [m for m in list(sys.modules) if m.split(".")[0] == "gliclass"]:
            del sys.modules[m]
        sys.modules.update(saved_mods)


# ---------------------------------------------------------------------------
# stage B: head-config matrix diff (upstream forward vs torch_ref forward)
# ---------------------------------------------------------------------------
def _head_matrix():
    """The pruned head-config matrix: every factor exercised, plus the
    all-on combo. (scorer, pooling, extract_text_features, squeeze_layers,
    use_lstm)."""
    combos = []
    for scorer in ("simple", "mlp", "weighted-dot"):
        for pooling in ("first", "mean", "max", "sum"):
            combos.append((scorer, pooling, False, False, False))
    combos += [
        ("simple", "first", True, False, False),
        ("simple", "first", False, True, False),
        ("simple", "first", False, False, True),
        ("weighted-dot", "mean", True, True, True),
    ]
    return combos


def stage_b() -> bool:
    import numpy as np
    import torch

    up = _import_upstream()
    from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig
    from gliclass.c_tpu.convert.convert import load_checkpoint_state_dict
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True,
        position_biased_input=False,
    )
    CLASS_TOK, SEP_TOK = 590, 591
    rng = np.random.default_rng(0)
    B, S, n_labels = 2, 24, 3
    # synthetic packed prompt: <<LABEL>> l ... <<SEP>> text
    ids = rng.integers(5, 580, size=(B, S)).astype(np.int64)
    for b in range(B):
        ids[b, 0], ids[b, 2], ids[b, 4], ids[b, 6] = (
            CLASS_TOK, CLASS_TOK, CLASS_TOK, SEP_TOK,
        )
    mask = np.ones((B, S), dtype=np.int64)
    mask[1, S - 4:] = 0
    t_ids, t_mask = torch.tensor(ids), torch.tensor(mask)

    failures = []
    for scorer, pooling, etf, squeeze, lstm in _head_matrix():
        cfg = GLiClassConfig(
            hidden_size=32, class_token_index=CLASS_TOK, text_token_index=SEP_TOK,
            prompt_first=True, scorer_type=scorer, pooling_strategy=pooling,
            extract_text_features=etf, squeeze_layers=squeeze, use_lstm=lstm,
            backbone=bb,
        )
        tag = f"scorer={scorer} pool={pooling} etf={etf} squeeze={squeeze} lstm={lstm}"
        try:
            # Build the UPSTREAM model from an equivalent upstream config.
            up_cfg = up.GLiClassModelConfig(
                encoder_config=_hf_encoder_config(bb),
                architecture_type="uni-encoder", prompt_first=True,
                scorer_type=scorer, pooling_strategy=pooling,
                extract_text_features=etf, squeeze_layers=squeeze,
                use_lstm=lstm, class_token_index=CLASS_TOK,
                text_token_index=SEP_TOK, hidden_size=32,
            )
            torch.manual_seed(0)
            up_model = up.GLiClassModel(up_cfg).eval()
            # Copy upstream weights into the reconstruction via the
            # PRODUCTION loader (tests the converter naming contract too).
            ours = build_torch_gliclass(cfg)
            load_checkpoint_state_dict(ours, up_model.state_dict())
            with torch.no_grad():
                up_out = up_model(input_ids=t_ids, attention_mask=t_mask)
                up_logits = (
                    up_out.logits if hasattr(up_out, "logits") else up_out[0]
                )
                our_logits, label_mask = ours(t_ids, t_mask, max_labels=n_labels)
            u = up_logits.detach().numpy()[..., :n_labels]
            o = our_logits.detach().numpy()[..., :n_labels]
            delta = float(np.abs(u - o).max())
            status = "OK" if delta <= 1e-4 else f"MISMATCH delta={delta:.3e}"
            log(f"stage B: {tag}: {status}")
            if delta > 1e-4:
                failures.append((tag, delta))
        except Exception as e:  # API drift is a finding, not a crash
            log(f"stage B: {tag}: ERROR {type(e).__name__}: {e}")
            failures.append((tag, str(e)))
    if failures:
        log(f"stage B FAILED on {len(failures)}/{len(_head_matrix())} combos")
        return False
    log("stage B: reconstruction == upstream on the full head matrix")
    return True


def _hf_encoder_config(bb):
    from transformers import DebertaV2Config

    return DebertaV2Config(
        vocab_size=bb.vocab_size, hidden_size=bb.hidden_size,
        num_hidden_layers=bb.num_hidden_layers,
        num_attention_heads=bb.num_attention_heads,
        intermediate_size=bb.intermediate_size,
        max_position_embeddings=bb.max_position_embeddings,
        relative_attention=bb.relative_attention,
        position_buckets=bb.position_buckets,
        pos_att_type=list(bb.pos_att_type), share_att_key=bb.share_att_key,
        norm_rel_ebd=bb.norm_rel_ebd,
        position_biased_input=bb.position_biased_input,
        layer_norm_eps=bb.layer_norm_eps, pad_token_id=bb.pad_token_id,
    )


# ---------------------------------------------------------------------------
# stage C: fetch + convert + selftest the real checkpoint
# ---------------------------------------------------------------------------
def stage_c(model: str) -> bool:
    _probe_network()
    from gliclass.c_tpu.cli import main as cli_main
    from gliclass.c_tpu.fetch import ensure_bundle

    log(f"stage C: fetch + convert {model} ...")
    bundle = ensure_bundle(model, quantize=True)
    log(f"stage C: bundle at {bundle}; selftest fp32 ...")
    rc32 = cli_main(["selftest", "--bundle", bundle, "--dtype", "float32"])
    log("stage C: selftest int8-dynamic ...")
    rc8 = cli_main(["selftest", "--bundle", bundle, "--int8-dynamic"])
    ok = rc32 == 0 and rc8 == 0
    log(f"stage C: {'OK' if ok else f'FAILED (fp32 rc={rc32}, int8 rc={rc8})'}")
    return ok


# ---------------------------------------------------------------------------
# stage D: F1 gate on a real eval set
# ---------------------------------------------------------------------------
def stage_d(model: str) -> bool:
    _probe_network()
    import dataclasses

    import numpy as np

    from gliclass.c_tpu.config import RuntimeConfig
    from gliclass.c_tpu.fetch import ensure_bundle
    from gliclass.c_tpu.pipeline import ZeroShotClassificationPipeline

    from datasets import load_dataset

    log("stage D: loading sst2 validation split ...")
    ds = load_dataset("SetFit/sst2", split="validation[:256]")
    texts = [r["text"] for r in ds]
    y_true = [int(r["label"]) for r in ds]
    labels = ["negative", "positive"]

    bundle = ensure_bundle(model, quantize=True)
    rt = RuntimeConfig(batch_size=32, max_length=256,
                       compute_dtype="float32", quant_mode="none")
    pipe32 = ZeroShotClassificationPipeline.from_bundle(bundle, rt)
    rt8 = dataclasses.replace(rt, compute_dtype="bfloat16",
                              quant_mode="int8-dynamic")
    pipe8 = ZeroShotClassificationPipeline.from_bundle(bundle, rt8)

    def micro_f1(pipe):
        res = pipe(texts, labels, classification_type="single-label")
        pred = [
            labels.index(r.decisions[0].label) if r.decisions else 0
            for r in res
        ]
        return float(np.mean(np.array(pred) == np.array(y_true))), pred

    f32, p32 = micro_f1(pipe32)
    f8, p8 = micro_f1(pipe8)
    delta = abs(f32 - f8)
    agree = float(np.mean(np.array(p32) == np.array(p8)))
    log(f"stage D: sst2 accuracy fp32={f32:.4f} int8-dynamic={f8:.4f} "
        f"delta={delta:.4f} (gate 0.005) agreement={agree:.4f}")
    return delta <= 0.005


# ---------------------------------------------------------------------------
def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default=DEFAULT_MODEL)
    ap.add_argument("--stage", choices=["A", "B", "C", "D"], default=None,
                    help="run one stage only (default: all)")
    args = ap.parse_args()

    stages = {
        "A": stage_a,
        "B": stage_b,
        "C": lambda: stage_c(args.model),
        "D": lambda: stage_d(args.model),
    }
    order = [args.stage] if args.stage else ["A", "B", "C", "D"]
    failed = False
    skipped = False
    for name in order:
        try:
            ok = stages[name]()
            failed |= not ok
        except NetworkUnavailable as e:
            log(f"stage {name}: SKIP — network boundary: {e}")
            skipped = True
            if not args.stage and name in ("A",):
                # stages B-D all need the package/checkpoint; nothing else
                # can run in an offline environment.
                log("offline environment: remaining stages skipped cleanly")
                return 0
        except ImportError as e:
            log(f"stage {name}: SKIP — upstream package unavailable: {e}")
            skipped = True
            if not args.stage:
                return 0
    if failed:
        return 1
    if args.stage and skipped:
        # An EXPLICITLY requested stage that never ran must be
        # distinguishable from one that ran and passed: exit 3 (CI keyed on
        # `--stage C/D` would otherwise read a skip as a PASS).
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
