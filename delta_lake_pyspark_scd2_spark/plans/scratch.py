"""Bounded scratch space for queries that materialize a temporary
versioned table (MERGE / UPDATE / MV-refresh demonstrations).

The oracle gate and the bench run each registry query several times;
uuid-named scratch dirs therefore accumulated without bound in /tmp
(round-3 advice). Paths here are DETERMINISTIC per (process, query
name): each execution wipes the previous run's copy before creating
its own, so at most one table per query per process ever exists, and
an ``atexit`` hook removes the process's root on exit. The pid in the
root keeps concurrent gate/bench/pytest processes isolated from each
other — within one process the reuse is safe because a query's result
is consumed before the same query runs again (true for the gate and
the bench, which collect each run before starting the next).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT = os.path.join(
    tempfile.gettempdir(), f"spark_graft_scratch_{os.getpid()}"
)
_registered = False


def scratch_path(name: str) -> str:
    """A fresh, deterministic scratch directory path for ``name``.

    Any previous contents are removed; the path itself is NOT created
    (table constructors expect to create it)."""
    global _registered
    if not _registered:
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        _registered = True
    path = os.path.join(_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(_ROOT, exist_ok=True)
    return path
