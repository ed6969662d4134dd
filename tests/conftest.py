"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's host-platform device virtualization, per the project test strategy
(SURVEY.md §4: the reference has no tests; we differential-test every layer).

Set ``EXAVATAR_TEST_TPU=1`` to SKIP the CPU force so hardware-gated tests
(e.g. tests/test_convergence.py's 512p TPU run) can actually execute on a
TPU-attached host; everything that needs the 8-device mesh should then be
deselected (those tests assert/skip on device count themselves).
"""
import os

_USE_TPU = os.environ.get("EXAVATAR_TEST_TPU", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A sitecustomize may have imported jax at interpreter start with
# JAX_PLATFORMS=<tpu plugin>; the config snapshot wins over os.environ, so
# force the platform through the live config (backends are not yet built).
import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

if not _USE_TPU:
    assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests gated behind RUN_SLOW=1"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults after enough compilations accumulate
    in one process (reproducible: parallel+train+avatar_model in sequence
    crash inside backend_compile, each pair passes). Dropping compiled
    executables between modules keeps the per-process compile population
    bounded; compiles within a module still share."""
    yield
    jax.clear_caches()
