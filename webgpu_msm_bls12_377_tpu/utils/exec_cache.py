"""Persistent compiled-executable cache (cold-compile amortization).

The reference recompiles WGSL in milliseconds per shader; this
platform's remote XLA+Mosaic compile costs 70-90 s per MSM size class
(PERF.md), and JAX's persistent compilation cache does not cover the
Mosaic custom-call compiles that dominate.  This module caches the
*fully compiled* executables on disk via
``jax.experimental.serialize_executable`` so a process restart pays
disk-load time instead of a recompile.

Design:

- ``wrap(key, build)`` returns a callable.  On its first invocation it
  resolves, in order: (1) a deserialized executable from disk, (2) an
  AOT ``jit(fn).lower(*args).compile()`` whose result is serialized to
  disk best-effort, (3) a plain ``jax.jit`` fallback if either AOT or
  serialization is unsupported on the active backend.  Later calls go
  straight to the resolved callable.
- Disk keys mix the caller's logical key with the jax version, the
  backend platform + device kind, and a content hash of this package's
  sources — editing any kernel invalidates every cached executable, so
  a stale binary can never silently compute old code.
- Enabled by default only on TPU backends (CPU AOT reloads print
  machine-feature warnings and CPU compiles are not the bottleneck).
  ``MSM_EXEC_CACHE=1/0`` forces it on/off; ``MSM_EXEC_CACHE_DIR``
  overrides the location (default ``<repo>/.exec_cache``).

Everything here is best-effort: any failure in load, AOT, or serialize
degrades to the exact behavior the engine had without this module.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from pathlib import Path
from typing import Any, Callable

import jax

_PKG_ROOT = Path(__file__).resolve().parent.parent
_src_hash_cache: str | None = None
_lock = threading.Lock()


def _source_hash() -> str:
    """Content hash of every .py source in the package (once/process)."""
    global _src_hash_cache
    if _src_hash_cache is None:
        h = hashlib.sha256()
        for p in sorted(_PKG_ROOT.rglob("*.py")):
            h.update(p.read_bytes())
        _src_hash_cache = h.hexdigest()[:16]
    return _src_hash_cache


def cache_dir() -> Path:
    d = os.environ.get("MSM_EXEC_CACHE_DIR")
    if d:
        return Path(d)
    return _PKG_ROOT.parent / ".exec_cache"


def enabled() -> bool:
    flag = os.environ.get("MSM_EXEC_CACHE")
    if flag is not None:
        return flag not in ("0", "false", "")
    try:
        platform = jax.default_backend()
        n_local = jax.local_device_count()
    except Exception:  # backend init failure: stay out of the way
        return False
    # Single-device processes only: a deserialized executable binds the
    # device assignment it was compiled with, and on a multi-device
    # host the unsharded engine programs reload expecting per-device
    # shards (observed on the 8-virtual-device CPU mesh).  The sharded
    # mesh engine manages its own programs and does not use this cache.
    # axon registers the TPU as its own platform name in some configs;
    # treat anything that is not plain cpu as cacheable hardware.
    return platform != "cpu" and n_local == 1


def _disk_key(logical_key: tuple) -> str:
    try:
        dev = jax.devices()[0]
        dev_kind = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    except Exception:
        dev_kind = "unknown"
    # env vars that select kernel VARIANTS at trace time must key the
    # disk entries, or an A/B run could load the other variant's binary
    variant_env = {
        k: os.environ.get(k)
        for k in ("MSM_PAIR_REDC", "MSM_PAIR_FULL", "MSM_SOFT_CARRY")
        if k in os.environ
    }
    raw = repr(
        (jax.__version__, dev_kind, _source_hash(), variant_env, logical_key)
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


class _CachedProgram:
    """Lazy-resolving callable: disk executable -> AOT compile -> jit."""

    __slots__ = ("_key", "_build", "_fn", "_resolve_lock")

    def __init__(self, logical_key: tuple, build: Callable[[], Callable]):
        self._key = logical_key
        self._build = build
        self._fn: Callable | None = None
        self._resolve_lock = threading.Lock()

    def __call__(self, *args: Any) -> Any:
        fn = self._fn
        if fn is None:
            with self._resolve_lock:
                fn = self._fn
                if fn is None:
                    fn = self._resolve(args)
                    self._fn = fn
        return fn(*args)

    def prewarm_async(self, abstract_args) -> threading.Thread:
        """AOT-compile in a daemon thread at ABSTRACT shapes.

        abstract_args: a tuple of ShapeDtypeStructs, or a zero-arg
        callable producing one (evaluated in the worker so e.g. an
        eval_shape of the plan program stays off the caller's path).

        Used by the engine's layout-hint cold path (utils/layout_hints):
        the main program compiles concurrently with the plan program's
        compile+run.  Skips when already resolved or a disk blob exists
        (deserialize at real-call time is ~2 s — not worth a thread).
        A real call arriving mid-compile blocks on _resolve_lock and
        then uses the finished executable; compile failure leaves the
        program unresolved so the normal call-time path handles it.
        """

        def work():
            with self._resolve_lock:
                if self._fn is not None:
                    return
                path = cache_dir() / f"{_disk_key(self._key)}.jexec"
                if path.exists():
                    return
                try:
                    aargs = (
                        abstract_args()
                        if callable(abstract_args)
                        else abstract_args
                    )
                    compiled = (
                        jax.jit(self._build()).lower(*aargs).compile()
                    )
                except Exception:
                    return
                self._persist(compiled, path)
                self._fn = compiled

        t = threading.Thread(target=work, daemon=True)
        t.start()
        return t

    # -- resolution ----------------------------------------------------

    def _resolve(self, args: tuple) -> Callable:
        from jax.experimental import serialize_executable as se

        path = cache_dir() / f"{_disk_key(self._key)}.jexec"
        if path.exists():
            try:
                with path.open("rb") as f:
                    blob, in_tree, out_tree = pickle.load(f)
                compiled = se.deserialize_and_load(blob, in_tree, out_tree)
                # probe once so an incompatible reload fails here (and
                # falls back) instead of surfacing to the engine
                compiled(*args)
                return compiled
            except Exception:
                try:
                    path.unlink()
                except OSError:
                    pass
        try:
            compiled = jax.jit(self._build()).lower(*args).compile()
        except Exception:
            return jax.jit(self._build())  # AOT unsupported: plain jit
        self._persist(compiled, path)
        return compiled

    @staticmethod
    def _persist(compiled, path) -> None:
        from jax.experimental import serialize_executable as se

        try:
            blob, in_tree, out_tree = se.serialize(compiled)
            path.parent.mkdir(parents=True, exist_ok=True)
            # atomic publish: concurrent processes race benignly
            fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception:
            pass  # serialization unsupported: still use the compiled fn


def wrap(logical_key: tuple, build: Callable[[], Callable]) -> Callable:
    """Disk-cached program if enabled, else a plain ``jax.jit``."""
    if enabled():
        return _CachedProgram(logical_key, build)
    return jax.jit(build())
