"""Test configuration: force JAX onto a simulated 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware.

NB: this image's sitecustomize registers the 'axon' TPU-tunnel backend and
forces ``jax_platforms=axon,cpu`` regardless of JAX_PLATFORMS in the
environment, so we must override via ``jax.config`` *after* import (but
before any backend initialization)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Skip XLA:CPU's expensive optimization passes: test compiles dominate
# suite wall-time (measured 22 s -> 3.7 s for one tiny-U-Net forward;
# parity drift vs torch 6e-8, far inside every tolerance). Tests assert
# correctness, never CPU throughput, so the slower generated code is
# irrelevant. Production TPU paths (bench.py, experiments) never see
# this flag — it is test-env only.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles many hundreds of XLA:CPU programs in one
    process; past ~190 tests the accumulated JIT state segfaulted the
    compiler inside test_unets' parity sweep (reproducibly at the same
    spot, while the same file passes standalone). Per-module cache
    clearing keeps the in-process program count bounded; cross-module
    cache reuse is minimal, so the runtime cost is small."""
    yield
    import jax

    jax.clear_caches()

# Shared reference-oracle scaffolding (single home: tools/reference_oracle.py;
# re-exported here so tests keep importing from conftest).
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
from reference_oracle import (REFERENCE_ROOT,  # noqa: E402,F401
                              patched_torch_cpu, reference_models)
