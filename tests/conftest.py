"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sets the XLA host-device-count flag before jax initializes and pins the
platform to CPU via jax.config (the env-var route can be overridden by
site-level config, the config API cannot).  See SURVEY.md §4 on multi-chip
simulation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA:CPU collective rendezvous hard-aborts after 40 s; on a small host the
# 8 virtual devices time-share few cores, so participants arrive staggered
# by minutes on big programs (the sharded train step has >1k all-reduces).
# Raise the deadline — this is a simulation knob, not a prod setting.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (heavy mesh-equivalence tier; also DPMN_RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    """Default suite stays under the wall-clock budget on this 1-core host:
    the slowest mesh-equivalence tests are tiered behind -m/--runslow while
    small-geometry variants keep the coverage in every run (VERDICT r4 #8).
    The slow tier must still be green at least once per round:
    DPMN_RUN_SLOW=1 python -m pytest tests/ -q."""
    if config.getoption("--runslow") or os.environ.get("DPMN_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: use --runslow or DPMN_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
