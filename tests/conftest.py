"""Test harness config.

Tests run on CPU with 8 virtual XLA devices — the TPU-native substitute for a
fake distributed backend (SURVEY.md §4): multi-chip sharding logic compiles
and executes on the virtual mesh without real hardware. Must be set before
jax initializes.
"""
import os

# force-set: the shell pre-sets JAX_PLATFORMS=axon (the real TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# sitecustomize (axon TPU relay) imports jax at interpreter startup, before
# this conftest runs — the env var alone is too late; update the live config.
jax.config.update("jax_platforms", "cpu")

# XLA CPU's default matmul precision is a bf16 fastmath path (~1e-2 relative
# error); parity tests need true fp32 accumulation. On TPU the perf path is
# an explicit bfloat16 compute dtype, not implicit downcasts.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow — the heavy executed-reference "
             "oracles and end-to-end CLI runs. The default (fast) tier "
             "finishes in minutes; the full suite is ~90 CPU-minutes "
             "single-process (use pytest-xdist -n auto on multi-core).")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: pass --runslow for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
