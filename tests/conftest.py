"""Test configuration: run on CPU with a virtual 8-device mesh by default.

The ambient environment may pre-import jax with a TPU plugin platform (via
PYTHONPATH sitecustomize) before this conftest runs, so setting JAX_PLATFORMS
in os.environ is too late -- we must override through jax.config before any
backend is initialized. Tests must not contend with benchmarks for the
single TPU chip.

Set ANY4_TPU_TEST_PLATFORM=tpu to run kernel tests against real hardware.
"""
import os

platform = os.environ.get("ANY4_TPU_TEST_PLATFORM", "cpu")
if platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by sitecustomize)

if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)

assert platform != "cpu" or jax.default_backend() == "cpu", (
    "tests must run on CPU; a TPU backend was already initialized before "
    "conftest could override the platform")
