"""Bounded scratch-space management for operators that round-trip
through local files (sink/scan round-trips, compaction, GDPR rewrite,
streaming checkpoints).

Two problems with raw ``tempfile.mkdtemp`` in operator bodies
(ADVICE r4): a fresh directory per invocation grows /tmp without bound
across repeated bench/parity sweeps (G-DELETE-01 rewrites a full copy
of the events table each run), and nothing ever removes the data. The
returned DataFrame reads the files lazily, so an operator cannot
``rmtree`` its own output before the caller collects — cleanup must be
deferred.

Fix: every scratch path lives under one per-process root that is
removed at interpreter exit, and the heavyweight sites use a
DETERMINISTIC per-tag directory that is wiped and recreated on each
call — repeated invocations overwrite in place, so steady-state disk
use is one copy per tag, not one per run.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT = os.path.join(tempfile.gettempdir(), f"dxs_scratch_{os.getpid()}")
_registered = False


def _ensure_root() -> str:
    global _registered
    os.makedirs(_ROOT, exist_ok=True)
    if not _registered:
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
        _registered = True
    return _ROOT


def scratch_dir(tag: str) -> str:
    """Deterministic per-tag scratch directory, wiped and recreated on
    every call. Use for operator outputs that are re-read by the
    returned DataFrame: the PREVIOUS run's copy is deleted the moment
    the operator runs again, bounding disk use to one live copy per
    tag. Not for two directories alive concurrently under one tag —
    give each a distinct tag (see g_compact_01's src/dst).

    Cross-invocation hazard: a LAZY DataFrame returned by an operator
    re-reads these files at collect time, so calling the same operator
    again before collecting the first result would serve wiped or
    rewritten data. Operators whose return value re-reads scratch
    output must materialize before returning (``.localCheckpoint()``
    — g_delete_02, g_clone_01, g_snap_02, s_qual_01, s_sink_05 all
    do)."""
    d = os.path.join(_ensure_root(), tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def scratch_mkdtemp(prefix: str = "dxs_") -> str:
    """Unique scratch directory under the exit-cleaned root — drop-in
    for ``tempfile.mkdtemp`` where per-call uniqueness matters (two
    live streaming checkpoints in one query). Growth is bounded by
    process lifetime instead of never reclaimed."""
    return tempfile.mkdtemp(prefix=prefix, dir=_ensure_root())
