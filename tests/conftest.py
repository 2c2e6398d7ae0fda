"""Test harness configuration.

Force JAX onto the CPU backend with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh` over 8 devices) is exercised without TPU hardware, per the
build mandate.  The host image pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel)
and imports jax from sitecustomize, so we override via ``jax.config`` before
any backend is instantiated rather than via the environment.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices())
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
