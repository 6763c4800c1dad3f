"""Cold-compile decomposition: where does the first-ever 2^20 cold go?

Round-3 verdict item #9: first-ever compile per size class is 50-101 s
(remote Mosaic/XLA compiler).  This probe measures, for a FRESH process
with a defeated exec cache:
  1. plan program compile (pure XLA: Montgomery entry, decompose, sort,
     layout) — timed via .lower() + .compile() AOT;
  2. main program compile (Mosaic stream kernel + permute + BPR);
  3. whether compiling plan and main CONCURRENTLY (two threads; XLA
     compilation releases the GIL) overlaps on the remote compiler, or
     serializes (PERF.md round-2 note says cross-PROCESS compiles
     serialize; in-process concurrency is untested).

Run in a quiet window:  MSM_EXEC_CACHE=0 python tools/probe_compile_split.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MSM_EXEC_CACHE", "0")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "serial"
    n = 1 << int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20

    from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine
    from webgpu_msm_bls12_377_tpu.ops import smvp_stream
    from webgpu_msm_bls12_377_tpu.params import CurveId

    engine = CuzkMsmEngine(CurveId.BLS12_377)
    chunk = engine._chunk_for(n)
    print(f"# n=2^{int(np.log2(n))} chunk={chunk} mode={mode}", flush=True)

    rng = np.random.RandomState(7)
    sw = rng.randint(0, 1 << 32, size=(8, n)).astype(np.uint32)
    sw[7] &= 0x1FFFFFFF
    pw = np.zeros((2, engine.coord_bytes // 4, n), np.uint32)
    pw_dev = jnp.asarray(pw)
    sw_dev = jnp.asarray(sw)
    np.asarray(pw_dev[0, 0, :1])

    plan_fn = engine._build_stream_plan_fn(chunk)
    t0 = time.perf_counter()
    plan_lowered = jax.jit(plan_fn).lower(pw_dev, sw_dev)
    t_lower_plan = time.perf_counter() - t0

    # main needs the slab class -> learn it with an abstract eval-free
    # path: run the plan once (pays plan compile in 'serial' mode), read
    # the slab count
    if mode == "serial":
        t0 = time.perf_counter()
        plan_c = plan_lowered.compile()
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        table, sv, layout = plan_c(pw_dev, sw_dev)
        s_slabs = smvp_stream.slab_class(
            int(layout.total_slabs), n
        )
        t_plan_run = time.perf_counter() - t0
        main_fn = engine._build_stream_main_fn(chunk, s_slabs, False)
        t0 = time.perf_counter()
        main_lowered = jax.jit(main_fn).lower(table, sv, layout)
        t_lower_main = time.perf_counter() - t0
        t0 = time.perf_counter()
        main_c = main_lowered.compile()
        t_main = time.perf_counter() - t0
        print(
            f"plan: lower {t_lower_plan:.2f}s compile {t_plan:.2f}s "
            f"run {t_plan_run:.2f}s"
        )
        print(f"main: lower {t_lower_main:.2f}s compile {t_main:.2f}s")
        print(f"total serial: {t_lower_plan + t_plan + t_plan_run + t_lower_main + t_main:.2f}s")
    else:
        # concurrent: predict the slab class WITHOUT running the plan
        # (the class depends only on the random-scalar layout; steps of
        # max(64, n/1024) make the prediction stable) by computing the
        # layout host-side on a cheap path: decompose+bincount in numpy.
        from webgpu_msm_bls12_377_tpu.ops.smvp_stream import LANES

        t0 = time.perf_counter()
        # host model of the layout's slab count: digits -> bucket lens
        # -> per-block max len sum (see build_stream_layout)
        scalars = sw.astype(np.uint64)
        # cheap estimate: random scalars fill buckets ~uniformly; the
        # measured class at 2^20/chunk16 is the one real runs land in.
        # Use the engine's own recorded class bound instead of exactness:
        est_entries = n * ((256 // chunk) + (1 if 256 % chunk else 0))
        nb = ((256 // chunk) + (1 if 256 % chunk else 0)) * (1 << (chunk - 1))
        mean_len = est_entries / nb
        # blocks of LANES buckets, slab count ~ sum of per-block maxima;
        # for Poisson(mean_len) the block max ≈ mean + 3*sqrt(mean)
        est_slabs = int(
            (nb / LANES) * (mean_len + 3 * np.sqrt(max(mean_len, 1.0)) + 1)
        )
        s_slabs = smvp_stream.slab_class(est_slabs, n)
        t_est = time.perf_counter() - t0
        main_fn = engine._build_stream_main_fn(chunk, s_slabs, False)
        # abstract shapes for main lowering
        table_shape = jax.eval_shape(plan_fn, pw_dev, sw_dev)
        t0 = time.perf_counter()
        main_lowered = jax.jit(main_fn).lower(*table_shape)
        t_lower_main = time.perf_counter() - t0

        results = {}

        def compile_one(name, lowered):
            t0 = time.perf_counter()
            results[name + "_c"] = lowered.compile()
            results[name] = time.perf_counter() - t0

        t0 = time.perf_counter()
        th1 = threading.Thread(target=compile_one, args=("plan", plan_lowered))
        th2 = threading.Thread(target=compile_one, args=("main", main_lowered))
        th1.start(); th2.start(); th1.join(); th2.join()
        wall = time.perf_counter() - t0
        print(
            f"est slabs {est_slabs} -> class {s_slabs} ({t_est*1e3:.1f} ms); "
            f"lower plan {t_lower_plan:.2f}s main {t_lower_main:.2f}s"
        )
        print(
            f"concurrent compile wall {wall:.2f}s "
            f"(plan {results['plan']:.2f}s, main {results['main']:.2f}s; "
            f"overlap = {'YES' if wall < results['plan'] + results['main'] - 5 else 'NO'})"
        )


if __name__ == "__main__":
    main()
