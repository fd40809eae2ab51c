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
