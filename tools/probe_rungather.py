"""Probe: replace the 17.8M-element sorted_vals gather with run-row gathers.

The slab layout reads, per (block, lane), a CONTIGUOUS run of sorted_vals
(segment start..start+len).  The status-quo gather issues one random
element read per (slab, lane) (~10 ns/elt -> ~180 ms at 2^20).  If an
R-element 1-D slice gather costs anywhere near the per-row price of the
256 B point-row gather (~15 ns/row), fetching runs in R-element rows cuts
the element count by ~R at an over-read factor of ~(1 + R/(2*avg_len)).

Measures ns/row for R in {4, 8, 16, 32, 64} slice gathers from a 17M
int32 array, plus the regroup transpose, vs the element-gather baseline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[-1]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timeit(fn, *args, n=3):
    out = fn(*args)
    fence(out)
    del out
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best.append(time.perf_counter() - t0)
        del out
    return min(best)


def run_gather(sv, starts, r):
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    return jax.lax.gather(
        sv,
        starts[:, None],
        dn,
        slice_sizes=(r,),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def main():
    total = 17 << 20  # ~17.8M elements, the 2^20 slab-position count
    rng = np.random.default_rng(0)
    sv = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, size=total).astype(np.int32)))

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"floor={floor*1e3:.2f} ms", flush=True)

    # baseline: full random element gather
    idx = jax.device_put(jnp.asarray(rng.integers(0, total, size=total).astype(np.int32)))
    t = timeit(jax.jit(lambda s, i: jnp.take(s, i)), sv, idx)
    print(f"elt gather {total} idx: {t*1e3:8.1f} ms  ({t/total*1e9:.2f} ns/elt)", flush=True)

    for r in (4, 8, 16, 32, 64):
        nrows = total // r
        starts = jax.device_put(
            jnp.asarray(rng.integers(0, total - r, size=nrows).astype(np.int32))
        )
        f = jax.jit(lambda s, st, r=r: run_gather(s, st, r))
        t = timeit(f, sv, starts)
        print(
            f"run gather R={r:3d} rows={nrows:9d}: {t*1e3:8.1f} ms "
            f"({t/nrows*1e9:6.1f} ns/row, {t/total*1e9:.2f} ns/covered-elt)",
            flush=True,
        )

    # regroup cost: (groups, LANES, R) -> (groups*R, LANES) transpose
    lanes = 256
    r = 16
    groups = total // (lanes * r)
    g = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 30, size=(groups, lanes, r)).astype(np.int32))
    )
    f = jax.jit(lambda a: a.transpose(0, 2, 1).reshape(groups * r, lanes))
    t = timeit(f, g)
    print(f"regroup transpose ({groups},{lanes},{r}): {t*1e3:8.1f} ms", flush=True)

    # slab-row regather: 67K rows of 1 KB from the regrouped array
    s_slabs = total // lanes
    rows = jax.device_put(
        jnp.asarray(rng.integers(0, groups * r, size=s_slabs).astype(np.int32))
    )
    arr2 = g.reshape(groups * r, lanes)
    t = timeit(jax.jit(lambda a, i: jnp.take(a, i, axis=0)), arr2, rows)
    print(f"slab-row regather {s_slabs} x 1KB rows: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
