"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(pjit over a Mesh) are exercised without TPU hardware, per SURVEY §4
(mesh emulation via --xla_force_host_platform_device_count).
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_tokenizer_file(tmp_path_factory):
    """A small real tokenizer.json (BPE, same Rust core as production) with the
    GLiClass special tokens, built offline — no network."""
    from tests.helpers import build_tiny_tokenizer

    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    build_tiny_tokenizer(str(path))
    return str(path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
