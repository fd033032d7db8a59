"""Driver-local filesystem guard shared by the streaming stores.

Data reads and writes in the stores go through Spark (FS-agnostic), but
their meta COMMIT protocol is publish-by-atomic-rename on the driver's
local filesystem (pyarrow write + ``os.replace``).  On an object store
that protocol must be swapped for a conditional-put, so construction
refuses remote schemes loudly rather than silently committing nothing.

The scheme check sniffs everything up to the FIRST ``:`` (urlparse
semantics), not a ``://`` substring: Spark accepts Hadoop-style
single-slash URIs like ``file:/tmp/store`` for the data writes, and a
naive ``'://' in path`` search lets those bypass the guard — ``os.makedirs``
then creates a literal ``file:`` directory relative to cwd while Spark
writes data under the real path, the silent meta/data divergence the
guard exists to prevent.
"""

from __future__ import annotations

import re

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]+):")


def strip_file_scheme(path: str) -> str:
    """``file:///p`` / ``file://localhost/p`` / ``file:/p`` -> ``/p``;
    anything without a ``file:`` scheme is returned unchanged."""
    m = _SCHEME_RE.match(path)
    if not m or m.group(1).lower() != "file":
        return path
    rest = path[m.end():]
    if rest.startswith("//"):
        rest = rest[2:]
        host, slash, tail = rest.partition("/")
        if host not in ("", "localhost"):
            raise ValueError(
                f"file URI with remote authority {host!r} is not a "
                f"driver-local path: {path!r}"
            )
        rest = slash + tail
    return rest or "/"


def local_meta_path(base_dir: str, component: str) -> str:
    """Validate that ``base_dir`` is driver-local and return its plain
    filesystem path (``file:`` prefixes stripped).  Raises ValueError
    for any remote scheme (``s3a://``, ``hdfs://``, ``file:/`` with a
    remote authority, ...)."""
    m = _SCHEME_RE.match(base_dir)
    scheme = m.group(1).lower() if m else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"{component} meta commits use the driver-local filesystem "
            f"(atomic rename); base_dir scheme '{scheme}:' is not "
            "supported — use a local path or adapt the commit protocol "
            "to the store's conditional-put"
        )
    return strip_file_scheme(base_dir) if scheme else base_dir
