"""Test configuration: force an 8-virtual-device CPU platform.

The environment's TPU plugin registers itself regardless of the JAX_PLATFORMS
env var, so the override must go through jax.config BEFORE any backend is
initialized.  Tests then exercise the multi-chip sharding paths (mesh over 8
host devices) without TPU hardware.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# XLA's default matmul precision is reduced even for f32 inputs (~1e-3 error);
# numeric parity tests need true f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests must run on the 8-virtual-device CPU platform; backend init "
    "happened before conftest could configure it")
