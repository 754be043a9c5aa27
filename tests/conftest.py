"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere; tests validate multi-chip
sharding logic without TPU hardware (the driver separately dry-runs the
multichip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def cmyk_layers_jxl() -> bytes:
    path = os.path.join(
        REFERENCE_ROOT, "crates/jxl-oxide-tests/tests/cms/cmyk_layers.jxl"
    )
    with open(path, "rb") as f:
        return f.read()


def fuzz_corpus_paths():
    d = os.path.join(REFERENCE_ROOT, "crates/jxl-oxide-tests/tests/fuzz_findings")
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, name) for name in os.listdir(d) if name.endswith(".fuzz")
    )
