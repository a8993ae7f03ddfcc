"""Test configuration: force an 8-virtual-device CPU platform.

Must run before jax is imported anywhere, so tests exercise the multi-chip
sharding paths (mesh over 8 host devices) without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# XLA's default matmul precision is reduced even for f32 inputs (~1e-3 error);
# numeric parity tests need true f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
