"""Test config: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests override it
to CPU so the suite is hermetic and multi-device (SURVEY.md §4d). Must happen
before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# torch-parity tests compare fp32 numerics; keep matmuls/convs in true fp32
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
