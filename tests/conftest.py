"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere; tests validate multi-chip
sharding logic without TPU hardware (the driver separately dry-runs the
multichip path via __graft_entry__.dryrun_multichip).
"""

import os

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
# remote-TPU tunnel); env setdefault is too late, so force the CPU platform
# through the config API before any backend is initialized. Tests run on an
# 8-device virtual CPU mesh; the real chip is reserved for bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def cmyk_layers_jxl() -> bytes:
    path = os.path.join(
        REFERENCE_ROOT, "crates/jxl-oxide-tests/tests/cms/cmyk_layers.jxl"
    )
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def fuzz_corpus_paths():
    d = os.path.join(REFERENCE_ROOT, "crates/jxl-oxide-tests/tests/fuzz_findings")
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, name) for name in os.listdir(d) if name.endswith(".fuzz")
    )
