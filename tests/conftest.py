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

# persistent compilation cache: the e2e trackers are large programs
# (minutes of XLA CPU compile); caching them across test processes makes
# the full suite dramatically faster and avoids recompiling programs
# that individual test runs already built
from uvipslam_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(path="/root/.jax_compile_cache_cpu")

# Large main-thread stack for XLA CPU compiles: handled by the early
# pytest plugin uvip_stackfix (loaded via pyproject addopts) — it must
# run before pytest capture, which a conftest cannot.
