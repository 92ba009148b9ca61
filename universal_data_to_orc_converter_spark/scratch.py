"""Session-lifetime scratch directories.

Several operators return LAZY DataFrames whose plans read from a
scratch directory the op staged (streaming pair/signature stores,
resharded stream sources, checkpoint locations). Those dirs cannot be
reclaimed before the op returns — the caller's first action would read
a deleted path — so they used to leak for the life of the machine, one
copy of a fixture table per call (the same staged-copy leak class the
r7 review wave fixed for the eager ops, where ``localCheckpoint`` +
``rmtree`` works).

``session_scratch`` is the fix for the lazy ops: a ``mkdtemp`` whose
path is registered for ``atexit`` reclamation. Within the session every
returned frame stays readable; at interpreter exit every registered dir
is removed. ``reclaim_all()`` is exposed for tests and for long-lived
hosts that want to reclaim between workloads (any frame still lazily
reading a reclaimed dir fails on its next action — callers that need
results past ``reclaim_all()`` must materialize first, which is the
same contract ``localCheckpoint`` ops already satisfy).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

_REGISTERED: list[str] = []


def path_key(path: str) -> str:
    """Stable 8-hex digest of a path, for keying scratch-dir prefixes.

    Python's ``hash()`` is PYTHONHASHSEED-salted per process — correct
    only while scratch dirs stay process-scoped; if reuse ever crosses
    processes the key silently changes every run (cache-busting), and
    two paths can in principle collide within a process (r11 ADVICE).
    sha1 of the absolute path is stable across processes and runs.
    """
    return hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]


def session_scratch(prefix: str) -> str:
    """``tempfile.mkdtemp(prefix=...)`` + atexit reclamation."""
    path = tempfile.mkdtemp(prefix=prefix)
    _REGISTERED.append(path)
    return path


def reclaim(paths: "list[str] | tuple[str, ...]") -> int:
    """Remove ONLY the given registered scratch dirs now; returns the
    count removed. Unregistered paths are ignored (never delete a path
    this module doesn't own). Prefer this over ``reclaim_all()`` inside
    shared-session test suites: ``reclaim_all()`` deletes EVERY
    registered dir, so a lazy frame or live streaming checkpoint staged
    by an unrelated earlier test fails on its next action."""
    n = 0
    for p in paths:
        if p in _REGISTERED:
            _REGISTERED.remove(p)
            shutil.rmtree(p, ignore_errors=True)
            n += 1
    return n


def reclaim_all() -> int:
    """Remove every registered scratch dir now; returns the count."""
    n = 0
    while _REGISTERED:
        shutil.rmtree(_REGISTERED.pop(), ignore_errors=True)
        n += 1
    return n


atexit.register(reclaim_all)
