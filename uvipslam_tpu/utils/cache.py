"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel take 1-5 minutes;
the persistent cache makes every later process start warm. Call
`enable_persistent_cache()` before the first jit execution (bench.py,
scripts, and __graft_entry__ all do).
"""

import os


def enable_persistent_cache(path: str = "/root/.jax_compile_cache") -> None:
    if os.environ.get("UVIP_NO_CACHE") == "1":
        return
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags — cache is best-effort
