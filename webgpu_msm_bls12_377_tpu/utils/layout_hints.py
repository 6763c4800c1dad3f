"""Persisted layout hints: near-deterministic size-class readbacks.

The stream/tree main programs depend on a plan readback (slab count,
level-1 window tiles) that is data-dependent in principle but — after
class rounding (slab_class steps of max(64, n/1024); w1 tiles fixed at 3
by the phantom-bucket packing) — lands on the SAME class for every
uniform input of a given (curve, path, chunk, n, K, lanes) size class
(measured: hybrid 2^18/19/20 classes stable across input sets,
PERF.md round 5).

Recording the observed class lets a cold start compile the main program
CONCURRENTLY with the plan program (exec_cache._CachedProgram.
prewarm_async): the in-process remote compile releases the GIL, so the
two compiles overlap (measured 31.9 s serial -> 20.3 s wall).  A stale
or wrong hint costs nothing — the readback is still authoritative, a
mismatch falls back to the serial path and overwrites the hint.

The table is committed (test-data/layout_hints.json) because classes
are a property of the algorithm + size, not of this machine.
"""

from __future__ import annotations

import json
import os
import threading

_LOCK = threading.Lock()


def _path() -> str:
    d = os.environ.get("MSM_LAYOUT_HINTS_DIR")
    if not d:
        d = os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            "test-data",
        )
    return os.path.join(d, "layout_hints.json")


def lookup(key: str) -> list | None:
    try:
        with open(_path()) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def record(key: str, value: list) -> None:
    # Hints are a pure optimization: on a read-only install (site-packages,
    # container image) the default path inside the package tree is not
    # writable, and a failed write must never fail the MSM that just
    # computed a correct result — mirror lookup() and swallow OSError.
    with _LOCK:
        path = _path()
        try:
            with open(path) as f:
                table = json.load(f)
        except (OSError, ValueError):
            table = {}
        if table.get(key) == value:
            return
        table[key] = value
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(table, f, indent=1, sort_keys=True)
            os.replace(tmp, path)
        except OSError:
            pass
