"""Stage-level profile of the streamed 2^20 pipeline on the real TPU.

Times each piece of the stream path separately (pprep / splan / gather /
kernel / permute+bpr+exit), fenced by host readback, floor-corrected.
Run:  python tools/probe_e2e_stream.py [--power 20]
"""

import argparse
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
from webgpu_msm_bls12_377_tpu.ops.bpr import reduce_buckets
from webgpu_msm_bls12_377_tpu.ops.field import from_mont
from webgpu_msm_bls12_377_tpu.params import CurveId


def fence(x):
    # ONE leaf only: each host readback is a ~27 ms round trip on this
    # platform, and one XLA program completes all its outputs atomically,
    # so fencing one output fences the program.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--power", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()
    n = 1 << args.power
    chunk = args.chunk
    from webgpu_msm_bls12_377_tpu.models.cuzk import num_windows_for
    num_windows = num_windows_for(chunk)

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"backend={jax.default_backend()} floor={floor*1e3:.1f} ms")

    case = testdata.make_bench_case(CurveId.BLS12_377, args.power)
    eng = CuzkMsmEngine(CurveId.BLS12_377, smvp_mode="stream")
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))

    pprep = jax.jit(eng._build_stream_pprep_fn())
    splan = jax.jit(eng._build_stream_splan_fn(chunk))

    t_pprep = timeit(pprep, pw)
    table = pprep(pw)
    t_splan = timeit(splan, sw)
    sorted_vals, layout = splan(sw)
    s_slabs = ss.slab_class(int(np.asarray(layout.total_slabs)), n)
    print(f"pprep   {t_pprep*1e3:8.1f} ms", flush=True)
    print(f"splan   {t_splan*1e3:8.1f} ms   (slabs={int(np.asarray(layout.total_slabs))}, class={s_slabs})", flush=True)

    gather = jax.jit(
        lambda tb, sv, lay: ss.gather_slabs(tb, sv, lay, s_slabs)
    )
    t_gather = timeit(gather, table, sorted_vals, layout)
    arr, outb, flags = gather(table, sorted_vals, layout)
    print(f"gather  {t_gather*1e3:8.1f} ms   arr={arr.shape} {arr.nbytes/1e9:.2f} GB", flush=True)

    nb_total = num_windows * (1 << (chunk - 1)) // ss.LANES
    kern = jax.jit(
        lambda a, ob, fl: ss.accumulate_buckets_streamed(
            eng.group, a, ob, fl, nb_total
        )
    )
    t_kern = timeit(kern, arr, outb, flags)
    blocks = kern(arr, outb, flags)
    fence(blocks)
    arr_bytes = arr.nbytes
    del arr  # 4+ GB; free before the tail stage
    n_entries = int(np.asarray(layout.total_slabs)) * ss.LANES
    print(
        f"kernel  {t_kern*1e3:8.1f} ms   "
        f"{n_entries/(t_kern-floor)/1e6:.1f} M adds/s "
        f"({arr_bytes/(t_kern-floor)/1e9:.0f} GB/s stream)",
        flush=True,
    )

    from webgpu_msm_bls12_377_tpu.ops.bpr import (
        bpr_order,
        reduce_buckets_prearranged,
    )

    order = bpr_order(num_windows, chunk, eng.num_bpr_threads)

    def tail(bl, lay):
        buckets = ss.permute_buckets(eng.group, bl, lay, order=order)
        wsums = reduce_buckets_prearranged(
            eng.group, buckets, num_windows, chunk, eng.num_bpr_threads
        )
        return tuple(from_mont(eng.ctx, c) for c in wsums)

    t_tail = timeit(jax.jit(tail), blocks, layout)
    print(f"tail    {t_tail*1e3:8.1f} ms   (permute + BPR + Mont exit)")

    total = t_pprep + t_splan + t_gather + t_kern + t_tail
    print(f"sum     {total*1e3:8.1f} ms (+{4*floor*1e3:.0f} ms floors counted)")


if __name__ == "__main__":
    main()
