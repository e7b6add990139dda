"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without a TPU slice (the
TPU-world fake backend, SURVEY.md §4).

Note: this environment pre-imports jax via a sitecustomize that selects
the TPU backend, so plain env vars are too late — use config.update
(valid until the first backend initialization) plus XLA_FLAGS, which is
read when the CPU client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
