"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Mirrors the reference's absence of a test suite with the test pyramid
SURVEY.md §4 prescribes: unit/golden kernels vs oracles, property tests, and
sharded-BA correctness on a virtual mesh (no TPU pod needed).
"""

import os

# Hard-override: tests always run on the virtual CPU mesh (the real chip is
# reserved for bench.py); TPU default matmul precision (bf16) would also break
# the float32 golden tolerances here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
