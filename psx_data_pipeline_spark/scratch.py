"""Session-scoped scratch directories for write→read lifecycle queries
(plans/io_queries, plans/stream, streaming/jobs).

One temp root per process, removed at interpreter exit; each call
returns a per-name subdirectory wiped clean on every invocation. This
keeps repeated in-process runs (bench's min-of-two, pytest repeats)
from accumulating unbounded mkdtemp litter in /tmp while still giving
every invocation a clean slate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(name: str) -> str:
    """Fresh scratch dir for ``name``: same path every call within a
    process, emptied on each call, deleted (with the shared root) at
    process exit. Callers are single-threaded query builders, so the
    wipe-then-recreate is race-free."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="psx_spark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    path = os.path.join(_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
