"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's absence of a test suite with the test pyramid
SURVEY.md §4 prescribes: unit/golden kernels vs oracles, property tests, and
sharded-BA correctness on a virtual mesh (no TPU pod needed).
"""

import os

# Hard-override: tests always run on the virtual CPU mesh (the real chip is
# reserved for bench.py); TPU default matmul precision (bf16) would also break
# the float32 golden tolerances here.
#
# The env vars alone are NOT sufficient on rigs where a startup shim imports
# jax before this conftest runs (observed with the axon TPU-relay platform:
# JAX_PLATFORMS set here was silently ignored and the whole suite dispatched
# through the ~30 ms/RTT relay — 10-100x slower, and hung outright when two
# pytest processes raced for the single-process-exclusive chip). The config
# knob below wins over anything a pre-imported jax picked up, as long as no
# backend has been initialized yet, which is guaranteed this early in pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    n = len(jax.devices())
    assert n >= 8 and jax.devices()[0].platform == "cpu", (
        f"virtual CPU mesh not active: {jax.devices()}"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
