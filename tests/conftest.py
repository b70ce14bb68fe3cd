"""Test harness setup.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(`jax.sharding.Mesh` / `shard_map`) is exercised without TPU hardware — the
standard substitute for a real pod (see SURVEY.md §4).

NOTE: this environment preloads jax via sitecustomize (axon TPU plugin), so
env vars are too late — the platform must be forced through jax.config.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 golden paths on CPU


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute golden renders, "
             "sharded end-to-end equivalence)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test, skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
