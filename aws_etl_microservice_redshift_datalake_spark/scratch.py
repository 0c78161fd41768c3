"""Process-scoped scratch space for queries with filesystem side effects.

q_compact_roundtrip / the ingest round-trips rewrite directories whose names
were previously derived only from sf_dir, so two concurrent runs at the same
scale factor raced on the frag/compact dirs mid-swap (ADVICE r4). The root
is overridable (SPARK_GRAFT_SCRATCH) and every process works under its own
``p<pid>`` subdirectory, removed best-effort at interpreter exit so repeated
driver rounds don't accumulate rewritten table copies.
"""

from __future__ import annotations

import atexit
import os
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH") or os.path.join(_REPO, ".tmp")


_REGISTERED: set[str] = set()


def process_scratch() -> str:
    """This process's private scratch dir (created on first use). Cleanup
    registration is keyed on this process's own bookkeeping, not the
    directory's existence — a recycled pid finding a stale dir from a dead
    process must still adopt (and eventually remove) it."""
    d = os.path.join(SCRATCH_ROOT, f"p{os.getpid()}")
    if d not in _REGISTERED:
        os.makedirs(d, exist_ok=True)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _REGISTERED.add(d)
    return d
