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

# Persistent compilation cache — but ONLY in the fresh subprocesses the
# @isolated decorator spawns (UVIP_INNER=1). In a long-lived pytest
# process, XLA's executable DESERIALIZATION segfaults late in the run
# (same accumulated native-state corruption that motivates the
# isolation, observed repeatedly at ~60% of the full suite); fresh
# processes read the cache reliably.
if os.environ.get("UVIP_INNER") == "1":
    from uvipslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(path="/root/.jax_compile_cache_cpu")

# Large main-thread stack for XLA CPU compiles: handled by the early
# pytest plugin uvip_stackfix (loaded via pyproject addopts) — it must
# run before pytest capture, which a conftest cannot.


# XLA CPU JIT code pages accumulate ~300 vm mappings per test; at the
# kernel default vm.max_map_count=65530 the process hits the ceiling
# around test ~115 and LLVM segfaults on the failed mmap (observed:
# reproducible crash in backend_compile_and_load / cache deserialize at
# the same point of the full suite, tiny program, 1 GB stack, RAM free).
# Raise the ceiling when we can, and release compiled executables
# between test modules to bound the growth either way.
def _raise_map_count():
    try:
        with open("/proc/sys/vm/max_map_count", "r+") as f:
            if int(f.read()) < 1048576:
                f.seek(0)
                f.write("1048576")
    except OSError:
        pass


_raise_map_count()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import jax as _jax

    _jax.clear_caches()
