"""Crash-safe directory replacement for file-backed tables.

``rmtree(target); rename(tmp, target)`` has a window where the table is
GONE: a crash between the two leaves nothing at ``target``, and an
at-least-once redelivery that checks ``exists(target)`` then silently
rebuilds the table from one batch, discarding every other key. The safe
sequence uses only atomic renames:

  1. rename ``target`` -> ``target__aside__<uuid>``   (atomic)
  2. rename ``tmp``    -> ``target``                  (atomic)
  3. delete the aside copy                            (best-effort cleanup)

A crash between 1 and 2 leaves the previous table intact under the aside
name; ``recover_dir`` (called before reading the table) renames it back.
A crash after 2 leaves a stale aside dir, which recovery just deletes.

On a real deployment the same contract comes from the table format's
commit protocol (Delta/Iceberg transaction log, HDFS atomic rename); this
module is the plain-posix-filesystem equivalent for the local sinks.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

_ASIDE = "__aside__"


def atomic_replace_dir(tmp: str, target: str) -> None:
    """Replace directory ``target`` with ``tmp`` using only atomic renames;
    at no point is the previous table unrecoverable."""
    aside = f"{target}{_ASIDE}{uuid.uuid4().hex[:8]}"
    if os.path.exists(target):
        os.rename(target, aside)
    os.rename(tmp, target)
    shutil.rmtree(aside, ignore_errors=True)


def recover_dir(target: str) -> bool:
    """Repair ``target`` after a crash mid-replace. Returns True if an
    aside copy was restored (crash landed between the two renames); stale
    aside copies (crash after the new table was in place) are deleted."""
    asides = sorted(glob.glob(glob.escape(target) + _ASIDE + "*"))
    if not asides:
        return False
    if os.path.exists(target):
        for a in asides:
            shutil.rmtree(a, ignore_errors=True)
        return False
    os.rename(asides[-1], target)
    for a in asides[:-1]:
        shutil.rmtree(a, ignore_errors=True)
    return True
