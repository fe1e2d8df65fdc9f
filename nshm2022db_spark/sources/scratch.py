"""Scratch-landing helpers for queries that round-trip through a real
file format (ragged CSV, header CSVs, GeoJSON, stream source dirs).

Two concerns the call sites share:

* **Stable keys.** Python's builtin ``hash(str)`` is salted per process
  (PYTHONHASHSEED), so a scratch path keyed on it never survives a run —
  every process re-lands the files. ``scratch_path`` keys on a SHA-1
  digest of the sf dir instead.
* **Atomic completion.** A multi-directory landing (rates + props CSVs)
  is not atomic; checking ``os.path.exists(base)`` can see a half-written
  landing from a crashed or concurrent run. Callers write everything,
  then ``mark_landed(base)``; readers trust the landing only when
  ``is_landed(base)``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

_MARKER = "_LANDED"


def scratch_path(kind: str, sf: str) -> str:
    """Per-(kind, sf-dir) scratch directory path, stable across processes."""
    key = hashlib.sha1(sf.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{kind}_{key}")


def is_landed(base: str) -> bool:
    return os.path.exists(os.path.join(base, _MARKER))


def mark_landed(base: str) -> None:
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, _MARKER), "w") as f:
        f.write("ok")
