"""Process isolation for heavy end-to-end tests.

This environment's XLA CPU backend reliably crashes (SIGSEGV/abort
inside backend_compile_and_load or cache deserialization) when a SECOND
multi-minute tracker program is compiled in one process — each such test
passes in a fresh process, with identical flags and a 1 GB stack, and
crashes only after another heavy compile ran first. Classic accumulated
native-state corruption; not debuggable at the Python level.

`@isolated` re-runs the decorated test in a pristine subprocess
(`python -m pytest this_file::name`), guarded by UVIP_INNER so the inner
invocation executes the real body. fork()-based isolation (pytest-forked
style) is NOT safe here: the forked child would inherit XLA's thread
pools mid-state.
"""

from __future__ import annotations

import functools
import inspect
import os
import subprocess
import sys

_INNER = "UVIP_INNER"


def isolated(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get(_INNER) == "1":
            return fn(*args, **kwargs)
        test_file = inspect.getfile(fn)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(test_file)))
        env = {**os.environ, _INNER: "1"}
        env.pop("_UVIP_STACK_REEXEC", None)  # let the child re-exec too
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{test_file}::{fn.__name__}", "-q", "-x"],
            env=env, cwd=repo_root, capture_output=True, text=True,
            timeout=3000,
        )
        if r.returncode != 0:
            raise AssertionError(
                f"isolated test {fn.__name__} failed (rc {r.returncode}):\n"
                + r.stdout[-4000:] + "\n" + r.stderr[-2000:]
            )
    return wrapper
