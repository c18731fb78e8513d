"""CLI end-to-end tests: convert -> run -> selftest on a tiny bundle, exercising
the reference's CLI contract (data.json [prompt_first]) and report format."""

import json
import os

import numpy as np
import pytest

import jax

from gliclass.c_tpu.cli import main
from gliclass.c_tpu.config import BackboneConfig, GLiClassConfig


@pytest.fixture(scope="module")
def tiny_bundle(tiny_tokenizer_file, tmp_path_factory):
    from gliclass.c_tpu.convert.convert import export_bundle
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass
    from gliclass.c_tpu.tokenization import PromptTokenizer

    tok = PromptTokenizer.from_file(tiny_tokenizer_file)
    bb = BackboneConfig(
        model_type="deberta-v2", vocab_size=600, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, position_buckets=16,
        norm_rel_ebd="layer_norm", share_att_key=True, position_biased_input=False,
    )
    cfg = GLiClassConfig(
        hidden_size=32, class_token_index=tok.label_token_id,
        text_token_index=tok.sep_token_id, prompt_first=True, backbone=bb,
    )
    model = build_torch_gliclass(cfg)
    path = str(tmp_path_factory.mktemp("bundle") / "tiny")
    export_bundle(model, cfg, tok, path, quantize=True)
    return path


@pytest.fixture()
def job_file(tmp_path):
    p = tmp_path / "job.json"
    p.write_text(
        json.dumps(
            {
                "texts": ["the quick brown fox", "why are you running"],
                "labels": [["science", "sports", "question"]],
                "same_labels": True,
                "classification_type": "single-label",
            }
        )
    )
    return str(p)


def test_cli_run(tiny_bundle, job_file, tmp_path, capsys):
    json_out = str(tmp_path / "out.json")
    rc = main(
        [
            "run", job_file, "--bundle", tiny_bundle,
            "--dtype", "float32", "--max-length", "64", "--json-out", json_out,
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Text_0:" in out and "Text_1:" in out
    assert "Execution time:" in out  # reference main.c:171 line
    data = json.load(open(json_out))
    assert len(data) == 2
    assert data[0]["decisions"][0]["label"] in ("science", "sports", "question")


def test_cli_run_prompt_first_override(tiny_bundle, job_file, capsys):
    rc = main(
        ["run", job_file, "false", "--bundle", tiny_bundle,
         "--dtype", "float32", "--max-length", "64"]
    )
    assert rc == 0
    assert "Execution time:" in capsys.readouterr().out


def test_cli_selftest(tiny_bundle, capsys):
    rc = main(
        ["selftest", "--bundle", tiny_bundle, "--dtype", "float32",
         "--max-length", "64"]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS" in out


def test_cli_selftest_int8_loose_gate(tiny_bundle, capsys):
    rc = main(
        ["selftest", "--bundle", tiny_bundle, "--dtype", "float32",
         "--max-length", "64", "--int8"]
    )
    out = capsys.readouterr().out
    assert rc == 0, out


def test_cli_convert_roundtrip(tiny_bundle, tiny_tokenizer_file, tmp_path, capsys):
    """convert: local checkpoint dir (safetensors + config + tokenizer) -> bundle."""
    import shutil

    from safetensors.torch import save_file

    from gliclass.c_tpu.convert import bundle as B
    from gliclass.c_tpu.convert.torch_ref import build_torch_gliclass

    cfg = B.load_config(tiny_bundle)
    model = build_torch_gliclass(cfg)
    ckpt = tmp_path / "hf_ckpt"
    ckpt.mkdir()
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(ckpt / "model.safetensors"),
    )
    (ckpt / "config.json").write_text(cfg.to_json())
    shutil.copy(tiny_tokenizer_file, ckpt / "tokenizer.json")

    out = str(tmp_path / "converted")
    rc = main(["convert", "--model-path", str(ckpt), "--save-path", out, "--quantize"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "weights.safetensors"))
    assert os.path.exists(os.path.join(out, "weights_int8.safetensors"))
    # converted bundle passes its own golden gate
    rc = main(["selftest", "--bundle", out, "--dtype", "float32", "--max-length", "64"])
    assert rc == 0


def test_cli_serve_wiring(tiny_bundle, monkeypatch):
    """`serve` subcommand arg wiring: constructs the server from the bundle,
    binds the requested (ephemeral) port, answers a real HTTP classify, and
    closes cleanly when serve_forever returns. The server internals are
    covered by test_serving; this pins the CLI plumbing the reference's
    one-shot binary never had (capability addition)."""
    import json as J
    import urllib.request

    from gliclass.c_tpu import serving

    seen = {}

    def drive_one_request(self):
        # stand-in for the blocking serve_forever: spin the listener thread,
        # serve one real request over HTTP, then return (CLI then closes)
        self.start()
        body = J.dumps({
            "texts": ["science fox runs"], "labels": ["science", "sports"],
            "classification_type": "single-label",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{self.port}/classify", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            seen["resp"] = J.loads(r.read())

    monkeypatch.setattr(serving.GLiClassServer, "serve_forever", drive_one_request)
    rc = main([
        "serve", "--bundle", tiny_bundle, "--port", "0",
        "--dtype", "float32", "--max-length", "64",
    ])
    assert rc == 0
    res = seen["resp"]["results"]
    assert len(res) == 1 and len(res[0]["decisions"]) == 1
    assert res[0]["decisions"][0]["label"] in ("science", "sports")


def test_cli_serve_sigterm_graceful(tiny_bundle):
    """SIGTERM must shut the server down cleanly with exit 0 (r5 review
    finding: shutdown() called on the signal-handling main thread deadlocks
    per the socketserver contract — docker stop would SIGKILL after the
    grace period). Runs the real `serve` CLI in a subprocess."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from gliclass.c_tpu.cli import main\n"
        f"sys.exit(main(['serve', '--bundle', {tiny_bundle!r}, "
        f"'--port', '{port}', '--dtype', 'float32', '--max-length', '64']))\n"
    )
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", child], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2
                ) as r:
                    r.read()
                up = True
                break
            except Exception:
                if proc.poll() is not None:
                    break
                time.sleep(0.5)
        assert up, (
            f"server never came up (rc={proc.poll()})\n"
            f"{proc.stderr.read() if proc.poll() is not None else ''}"
        )
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=30)  # deadlock regression: would hang here
        assert rc == 0, f"serve exited {rc} on SIGTERM"
    finally:
        if proc.poll() is None:
            proc.kill()
