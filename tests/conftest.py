"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU backend and
force-sets jax_platforms="axon,cpu" via jax.config (overriding env vars),
so we must flip platform selection back through jax.config here. XLA_FLAGS
is set before the CPU client is first created, giving tests an 8-device
virtual CPU mesh for sharding tests.

f64 is enabled so math-core tests can check against high-precision
references; library code is dtype-explicit (f32 by default) so this does
not mask TPU behavior.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
