"""Stage-level profile of the PRODUCTION hybrid-tree 2^20 pipeline.

Times each piece of the auto path (tree K=2 + packed stream finish)
separately, fenced by host readback, floor-corrected — the data source
for the PERF.md roofline table.
Run:  python tools/probe_hybrid_stages.py [--power 20] [--chunk 16]
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
from webgpu_msm_bls12_377_tpu.models.cuzk import (
    CuzkMsmEngine,
    mont_point_table,
    num_windows_for,
)
from webgpu_msm_bls12_377_tpu.ops import smvp_stream as ss
from webgpu_msm_bls12_377_tpu.ops import smvp_tree as st
from webgpu_msm_bls12_377_tpu.ops.bpr import (
    bpr_order,
    reduce_buckets_prearranged,
)
from webgpu_msm_bls12_377_tpu.ops.buckets import build_bucket_plan
from webgpu_msm_bls12_377_tpu.ops.decompose import decompose_scalars_signed
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--power", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    args = ap.parse_args()
    n = 1 << args.power
    chunk = args.chunk
    K = args.k
    num_windows = num_windows_for(chunk)
    curve = (CurveId.BLS12_377 if args.curve == "bls12_377"
             else CurveId.EDWARDS_BLS12)

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"backend={jax.default_backend()} floor={floor*1e3:.1f} ms")

    case = testdata.make_bench_case(curve, args.power)
    eng = CuzkMsmEngine(curve, smvp_mode="tree", tree_finish=K)
    group = eng.group
    lanes = eng.stream_lanes
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))

    kn = num_windows * n
    num_buckets_e = num_windows * ((1 << (chunk - 1)) + 1)

    pprep = jax.jit(
        lambda p: st.build_tree_table(group, mont_point_table(eng.ctx, group, p))
    )

    def plan_fn(s):
        digits = decompose_scalars_signed(s, chunk, num_windows)
        plan = build_bucket_plan(digits, chunk)
        return plan.sorted_vals, st.build_hybrid_plan(
            plan.starts, plan.lens, kn, K, num_windows, lanes
        )

    tplanj = jax.jit(plan_fn)
    t_pprep = timeit(pprep, pw)
    table = pprep(pw)
    t_plan = timeit(tplanj, sw)
    sorted_vals, tplan = tplanj(sw)
    maxlen, span, total_slabs = (int(v) for v in np.asarray(tplan.stats))
    w1t = st.w1_tiles_for(span)
    s_slabs = ss.slab_class(total_slabs, n)
    t_cls = st.level_classes(kn, num_buckets_e, K)
    print(f"pprep   {t_pprep*1e3:8.1f} ms   table={table.shape}", flush=True)
    print(f"plan    {t_plan*1e3:8.1f} ms   maxlen={maxlen} span={span} "
          f"w1t={w1t} slabs={total_slabs}->{s_slabs}", flush=True)

    g0 = jax.jit(lambda tb, sv: st.gather_level0(tb, sv, w1t))
    t_g0 = timeit(g0, table, sorted_vals)
    arr0 = g0(table, sorted_vals)
    print(f"l0gath  {t_g0*1e3:8.1f} ms   arr0={arr0.shape} "
          f"{arr0.nbytes/1e9:.2f} GB", flush=True)

    l1 = jax.jit(
        lambda a, l, m: st.run_tree_level(
            group, a, l, m, t_cls[0], "aff", w1t, last=False)
    )
    t_l1 = timeit(l1, arr0, tplan.loc1, tplan.m1)
    lvl = l1(arr0, tplan.loc1, tplan.m1)
    print(f"level1  {t_l1*1e3:8.1f} ms   "
          f"({t_cls[0]/max(t_l1-floor,1e-9)/1e6:.1f} M nodes/s)", flush=True)
    del arr0

    lens = tplan.lens
    c_prev = (lens + 1) >> 1
    s_prev = jnp.cumsum(c_prev) - c_prev
    t_levels = 0.0
    for k in range(2, K + 1):
        c_k = (c_prev + 1) >> 1
        s_k = jnp.cumsum(c_k) - c_k
        mapj = jax.jit(
            lambda sp, cp, sk, ck, _k=k: st.build_level_map(
                sp, cp, sk, ck, t_cls[_k - 1], t_cls[_k - 2] // st.BLOCK, 3)
        )
        t_map = timeit(mapj, s_prev, c_prev, s_k, c_k)
        loc, m, _ = mapj(s_prev, c_prev, s_k, c_k)
        lk = jax.jit(
            lambda a, l, mm, _k=k: st.run_tree_level(
                group, a, l, mm, t_cls[_k - 1], "full", 3, last=False)
        )
        t_lk = timeit(lk, lvl, loc, m)
        lvl = lk(lvl, loc, m)
        print(f"level{k}  {t_lk*1e3:8.1f} ms  (map {t_map*1e3:6.1f} ms)",
              flush=True)
        t_levels += t_lk + t_map
        c_prev, s_prev = c_k, s_k

    pg = jax.jit(lambda a, lay: ss.gather_packed_slabs(a, lay, s_slabs))
    t_pg = timeit(pg, lvl, tplan.layout)
    arr, outb, flags = pg(lvl, tplan.layout)
    print(f"pkgath  {t_pg*1e3:8.1f} ms   arr={arr.shape} "
          f"{arr.nbytes/1e9:.2f} GB", flush=True)

    nb_total = tplan.layout.starts_rk.shape[0]
    pk = jax.jit(
        lambda a, o, f: ss.accumulate_packed_streamed(
            group, a, o, f, nb_total, lanes=lanes)
    )
    t_pk = timeit(pk, arr, outb, flags)
    blocks = pk(arr, outb, flags)
    # true adds in the finish = remaining nodes after K levels
    t_true = int(np.asarray(c_prev.sum()))
    print(f"pkkern  {t_pk*1e3:8.1f} ms   "
          f"({t_true/max(t_pk-floor,1e-9)/1e6:.1f} M adds/s true)",
          flush=True)
    del arr

    order = bpr_order(num_windows, chunk, eng.num_bpr_threads)

    def tail(bl, lay):
        buckets = ss.permute_buckets(group, bl, lay, order=order)
        wsums = reduce_buckets_prearranged(
            group, buckets, num_windows, chunk, eng.num_bpr_threads
        )
        return tuple(from_mont(eng.ctx, c) for c in wsums)

    t_tail = timeit(jax.jit(tail), blocks, tplan.layout)
    print(f"tail    {t_tail*1e3:8.1f} ms   (permute + BPR + Mont exit)")

    total = t_pprep + t_plan + t_g0 + t_l1 + t_levels + t_pg + t_pk + t_tail
    print(f"sum     {total*1e3:8.1f} ms (floors not subtracted; "
          f"~{floor*1e3:.0f} ms each x ~8 pieces)")


if __name__ == "__main__":
    main()
