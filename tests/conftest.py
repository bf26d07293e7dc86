"""Test harness config: force the CPU backend with 8 virtual devices so all
multi-device (mesh/sharding) logic is exercised without TPU hardware
(SURVEY.md §4 — the test pyramid the reference lacks).

NOTE: the sandbox's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a remote TPU tunnel), so env vars set here are too late;
we must go through jax.config.update. XLA_FLAGS is still read lazily at CPU
backend initialization, which has not happened yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
