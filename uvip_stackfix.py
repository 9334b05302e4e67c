"""Early pytest plugin: ensure a large main-thread stack before XLA runs.

XLA's CPU compile recursion segfaults at the default 8 MB stack on this
project's largest fused programs (observed in backend_compile_and_load
compiling the two-state VI solve). Raising RLIMIT_STACK at runtime is
not reliable (existing mappings can block main-stack growth), so we
raise it and RE-EXEC once.

This must run BEFORE pytest's capture plugin redirects fd 1/2 —
re-execing from a conftest (loaded under capture) sends all output of
the new process into orphaned capture temp files. Loaded via
`addopts = "-p uvip_stackfix"` (pyproject), plugins import during
command-line parsing, ahead of capture setup.
"""

import os
import resource
import sys

_WANT = 1024 * 1024 * 1024


def _ensure_stack() -> None:
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if soft == resource.RLIM_INFINITY or soft >= _WANT:
        return
    if os.environ.get("_UVIP_STACK_REEXEC") == "1":
        return
    try:
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (_WANT if hard == resource.RLIM_INFINITY else min(_WANT, hard),
             hard),
        )
        os.environ["_UVIP_STACK_REEXEC"] = "1"
        # re-invoke via -m so CWD stays on sys.path
        os.execv(sys.executable,
                 [sys.executable, "-m", "pytest"] + sys.argv[1:])
    except (ValueError, OSError):
        pass


_ensure_stack()
