"""Test harness config.

Tests must be hermetic: fast, local-CPU, independent of the TPU tunnel. This
container injects a TPU PJRT plugin into every interpreter via a sitecustomize
hook, which calls ``jax.config.update("jax_platforms", "axon,cpu")`` — that
CONFIG value supersedes the JAX_PLATFORMS env var, so with the hook loaded all
jax work (even "CPU" tests) routes to the remote chip: reduced matmul precision,
a network round-trip per eager op, and hangs whenever the tunnel is busy.

The fix is to set the config back to pure local CPU before any computation, and
request 8 virtual CPU devices so multi-chip sharding paths (pjit over a Mesh)
are exercised without hardware, per SURVEY §4's mesh-emulation strategy.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Must override the sitecustomize's jax.config.update("jax_platforms","axon,cpu")
# — config beats the env var, so the env var alone is NOT enough.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    # Fail fast if the remote plugin would capture the computation anyway.
    assert jax.default_backend() == "cpu", (
        "tests must run on local CPU, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


@pytest.fixture(scope="session")
def tiny_tokenizer_file(tmp_path_factory):
    """A small real tokenizer.json (BPE, same Rust core as production) with the
    GLiClass special tokens, built offline — no network."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import build_tiny_tokenizer

    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    build_tiny_tokenizer(str(path))
    return str(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
