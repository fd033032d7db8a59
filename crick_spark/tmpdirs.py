"""Run-scoped temp directories for queries that write-then-read parquet.

Roundtrip/persist/layout queries need scratch storage whose files stay
readable for the lifetime of the returned (lazy) DataFrame — so they
cannot be deleted eagerly — but must not accumulate across runs.  All
such queries allocate through :func:`run_tmpdir`, which nests them under
ONE per-process root removed at interpreter exit.

Queries whose result is materialized before return (localCheckpoint)
still clean up eagerly themselves; this is the fallback for the lazy
ones.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def _run_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="crick_run_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def run_tmpdir(prefix: str) -> str:
    """A fresh scratch dir under the process-wide run root (cleaned on
    exit).  Drop-in replacement for ``tempfile.mkdtemp(prefix=...)``."""
    return tempfile.mkdtemp(prefix=prefix, dir=_run_root())
