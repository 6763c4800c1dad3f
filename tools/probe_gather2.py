"""Measure alternatives to the 180 ms sorted_vals element gather at 2^20.

Candidates:
  a. status quo: random element gather of 17.8M src indices;
  b. scatter formulation: scatter 16.7M values into a 17.8M dest array
     (unique indices, drop mode);
  c. sorted-index gathers: take from small arrays at 16.7M *sorted*
     indices (the dest-computation cost of the sort formulation);
  d. one extra lax.sort of 16.7M (key, val) pairs (the reorder cost);
  e. row gather from a HALF-size table (table-size latency effect).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from webgpu_msm_bls12_377_tpu.harness import testdata
from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine, SCALAR_BITS
from webgpu_msm_bls12_377_tpu.ops import smvp_stream as ss
from webgpu_msm_bls12_377_tpu.params import CurveId


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


def main():
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << power
    chunk = 16
    num_windows = SCALAR_BITS // chunk
    kn = num_windows * n

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"floor={floor*1e3:.1f} ms", flush=True)

    case = testdata.make_bench_case(CurveId.BLS12_377, power)
    eng = CuzkMsmEngine(CurveId.BLS12_377, smvp_mode="stream")
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))
    table = jax.jit(eng._build_stream_pprep_fn())(pw)
    sorted_vals, layout = jax.jit(eng._build_stream_splan_fn(chunk))(sw)
    s_slabs = ss.slab_class(int(np.asarray(layout.total_slabs)), n)
    m = s_slabs * ss.LANES
    print(f"kn={kn} slab positions={m}", flush=True)

    rng = np.random.default_rng(0)
    # (a) random element gather, 17.8M indices into a kn array
    src = jax.device_put(
        jnp.asarray(rng.integers(0, kn, size=m).astype(np.int32))
    )
    t = timeit(jax.jit(lambda sv, i: jnp.take(sv, i)), sorted_vals, src)
    print(f"a. random elt gather   {t*1e3:8.1f} ms", flush=True)

    # (b) scatter kn values to unique positions in an m array
    dest = jax.device_put(
        jnp.asarray(rng.permutation(m)[:kn].astype(np.int32))
    )
    vals = sorted_vals

    def scat(vals, dest):
        return (
            jnp.full((m,), 42, jnp.uint32)
            .at[dest]
            .set(vals, mode="drop", unique_indices=True)
        )

    t = timeit(jax.jit(scat), vals, dest)
    print(f"b. scatter kn->m       {t*1e3:8.1f} ms", flush=True)

    # (c) sorted-index element gather (16.7M sorted indices, small table)
    small = jnp.arange(1 << 19, dtype=jnp.uint32)
    sidx = jax.device_put(
        jnp.asarray(
            np.sort(rng.integers(0, 1 << 19, size=kn)).astype(np.int32)
        )
    )
    t = timeit(jax.jit(lambda s, i: jnp.take(s, i)), small, sidx)
    print(f"c. sorted elt gather   {t*1e3:8.1f} ms (524k table)", flush=True)

    # (d) one more 16.7M-element 2-operand sort
    k2 = jax.device_put(jnp.asarray(rng.integers(0, m, size=kn).astype(np.uint32)))
    t = timeit(
        jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=0, num_keys=1)),
        k2, sorted_vals,
    )
    print(f"d. 16.7M 2-op sort     {t*1e3:8.1f} ms", flush=True)

    # (e) row gather from half-size (single-form) table
    idx_half = jax.device_put(
        jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))
    )
    half = table[: n + 8]
    t = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0)), half, idx_half)
    print(f"e. row gather half tbl {t*1e3:8.1f} ms (268 MB table)", flush=True)
    idx_full = jax.device_put(
        jnp.asarray(rng.integers(0, 2 * n, size=m).astype(np.int32))
    )
    t = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0)), table, idx_full)
    print(f"e. row gather full tbl {t*1e3:8.1f} ms (537 MB table)", flush=True)


if __name__ == "__main__":
    main()
