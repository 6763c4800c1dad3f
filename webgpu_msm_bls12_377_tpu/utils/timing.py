"""Fencing and steady-state timing helpers.

The reference times each backend with performance.now() around an awaited
promise (src/ui/Benchmark.tsx:31-34).  The JAX analogue needs care on this
platform: block_until_ready on the axon relay can return at enqueue time,
so a hard fence reads one element back to the host.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fence(tree) -> None:
    """Force completion of every array in a pytree via a host readback."""
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def time_fn(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Mean steady-state seconds per call, hard-fenced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters
