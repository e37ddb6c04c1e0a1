"""Test configuration: force an 8-virtual-device CPU platform so distributed
(pjit / mesh) paths are unit-testable without TPU hardware, and keep numerics
deterministic (f32 matmuls on CPU).

NB: the environment boots JAX at interpreter start (a ``sitecustomize`` on
PYTHONPATH registers the tunneled ``axon`` TPU backend), so setting
``JAX_PLATFORMS`` here is too late to matter — but backends are not yet
*initialized* at conftest-import time, so ``jax.config.update`` and the
``XLA_FLAGS`` device-count flag still take effect.  Without this, every test
op round-trips through the TPU network tunnel.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
