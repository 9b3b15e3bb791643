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


# Per-test watchdog: a single wedged test (e.g. a socket wait under heavy
# CPU starvation) must fail loudly instead of hanging the whole suite until
# the CI-level kill. SIGALRM fires on the main thread, so even a blocking
# recv()/join() in test code is interrupted. 600 s is ~10x the slowest
# legitimate test on a 4-core box.
_TEST_TIMEOUT_S = int(os.environ.get("SLAM_TEST_TIMEOUT_S", "600"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    import signal

    def _alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded {_TEST_TIMEOUT_S}s (watchdog)"
        )

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
