"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Mirrors the reference's test strategy (SURVEY.md §4) but with no hardware
requirement: the reference's tests all need a real GPU; ours run anywhere on
the JAX CPU backend (fp64 available there), and sharding tests use a virtual
8-device mesh.

Note: merely setting JAX_PLATFORMS=cpu is not enough in environments whose
sitecustomize registers a TPU plugin and calls
``jax.config.update("jax_platforms", ...)`` at interpreter start — the config
update wins over the env var, so we update the config again here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
