"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sets the XLA host-device-count flag before jax initializes and pins the
platform to CPU via jax.config (the env-var route can be overridden by
site-level config, the config API cannot).  See SURVEY.md §4 on multi-chip
simulation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
