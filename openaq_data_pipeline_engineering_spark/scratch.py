"""Deterministic per-process scratch directories for sink/streaming
declared queries.

Repeated invocations of a query (bench warmup + best-of-N runs, pytest,
the differential harness) previously called ``tempfile.mkdtemp`` each
time and never cleaned up — each run accumulated another full copy of
whatever the query writes (for ``csv_source_roundtrip`` and the
stateful-streaming drop dir, a complete copy of the events table).

``fresh_scratch_dir(name)`` instead returns the SAME path for a given
name within one Python process (``$TMPDIR/openaq_scratch_<pid>/<name>``),
deleting any prior contents first, so:

- re-runs overwrite in place — disk usage is bounded at one copy per
  distinct query name, regardless of how many times the suite runs;
- streaming checkpoints are still FRESH each invocation (a reused
  availableNow checkpoint would replay nothing and yield empty
  results), because the wipe happens on every call;
- concurrent sessions never collide (the pid component), and the whole
  per-process root is removed at interpreter exit via ``atexit``.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT = os.path.join(tempfile.gettempdir(), f"openaq_scratch_{os.getpid()}")
_CLEANUP_REGISTERED = False


def _cleanup() -> None:
    shutil.rmtree(_ROOT, ignore_errors=True)


def fresh_scratch_dir(name: str) -> str:
    """Return an empty scratch dir at a deterministic per-process path.

    Any contents from a previous invocation under the same name are
    removed first — callers always see an empty directory.
    """
    global _CLEANUP_REGISTERED
    if not _CLEANUP_REGISTERED:
        atexit.register(_cleanup)
        _CLEANUP_REGISTERED = True
    path = os.path.join(_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
