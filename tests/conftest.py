"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no distributed test story at all (SURVEY.md §4); here every
test runs against the same XLA code paths that run on TPU, with
``--xla_force_host_platform_device_count=8`` standing in for an 8-chip slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # axon plugin ignores JAX_PLATFORMS
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
