"""Test harness: fake an 8-device TPU-like mesh on CPU.

Multi-chip hardware is not available in CI; per the reference's own test
strategy of faking externals (reference tests/test_plugins.py:108-131 uses
unittest.mock for network), we fake the device mesh with XLA's host
platform device count so every sharding/collective path is exercised for
real — the same jit programs run on a real TPU slice unchanged.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers a TPU PJRT plugin before env
# vars are consulted; this config update wins as long as no backend has
# been initialized yet.
jax.config.update("jax_platforms", "cpu")

import asyncio  # noqa: E402
import inspect  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    """Run ``async def`` tests without pytest-asyncio (not in this image)."""
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def temp_dir(tmp_path):
    return str(tmp_path)
