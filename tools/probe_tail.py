"""Break down the 2^20 stream-pipeline tail: permute+canon / BPR stages /
Montgomery exit, each floor-corrected on the real TPU."""

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
from webgpu_msm_bls12_377_tpu.ops import bpr as dbpr
from webgpu_msm_bls12_377_tpu.ops.field import from_mont
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

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"floor={floor*1e3:.1f} ms", flush=True)

    case = testdata.make_bench_case(CurveId.BLS12_377, power)
    eng = CuzkMsmEngine(CurveId.BLS12_377, smvp_mode="stream")
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))
    table = jax.jit(eng._build_stream_pprep_fn())(pw)
    sorted_vals, layout = jax.jit(eng._build_stream_splan_fn(chunk))(sw)
    s_slabs = ss.slab_class(int(np.asarray(layout.total_slabs)), n)
    nb_total = num_windows * (1 << (chunk - 1)) // ss.LANES
    arr, outb, flags = jax.jit(
        lambda tb, sv, lay: ss.gather_slabs(tb, sv, lay, s_slabs)
    )(table, sorted_vals, layout)
    blocks = jax.jit(
        lambda a, ob, fl: ss.accumulate_buckets_streamed(
            eng.group, a, ob, fl, nb_total
        )
    )(arr, outb, flags)
    fence(blocks)
    del arr

    t_perm = timeit(
        jax.jit(lambda b, lay: ss.permute_buckets(eng.group, b, lay)),
        blocks, layout,
    )
    print(f"permute+canon {t_perm*1e3:8.1f} ms", flush=True)
    buckets = jax.jit(
        lambda b, lay: ss.permute_buckets(eng.group, b, lay)
    )(blocks, layout)

    for threads in (512, 1024, 2048, 4096):
        t_bpr = timeit(
            jax.jit(
                lambda b: dbpr.reduce_buckets(
                    eng.group, b, num_windows, chunk, threads
                )
            ),
            buckets,
        )
        print(f"bpr t={threads:5d}  {t_bpr*1e3:8.1f} ms", flush=True)

    wsums = jax.jit(
        lambda b: dbpr.reduce_buckets(eng.group, b, num_windows, chunk, 1024)
    )(buckets)
    t_exit = timeit(
        jax.jit(lambda ws: tuple(from_mont(eng.ctx, c) for c in ws)), wsums
    )
    print(f"mont exit     {t_exit*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
