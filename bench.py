"""Benchmark harness: cuZK MSM throughput on the local device.

Mirrors the reference's scripted sweep protocol
(src/submission/miscellaneous/full_benchmarks.ts:6-166): one cold run
(includes XLA compile, the analogue of the forced-recompile run), then
``--runs`` warm runs.  Every run is verified against a pinned golden
with DISTINCT points (testdata.make_bench_case: P_i = k_i*G with known
k_i, expected = (sum s_i*k_i)*G, cross-checked once against the
independent native C++ Pippenger oracle and registered in
test-data/goldens.json — the analogue of testCases.ts + the live check
in ui/Benchmark.tsx:41-51).  --same-point falls back to the round-1
all-generator protocol (AllBenchmarks.tsx:83-89).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline normalizes against 524288 points/s — a 2.0 s 2^20 MSM, the
ballpark of the reference submission's published browser results on an
Apple M-class GPU (the repo itself vendors no absolute numbers,
README.md:53-55; see BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 524288.0  # 2^20 points in ~2 s (see docstring)


def bench_batch(args, curve, n, chunk_size, engine):
    """Batched-pipelined MSM bench (BASELINE config 5: K x 2^20 batched).

    Times compute_msm_batch's pipelined schedule (shared signed point
    table, back-to-back async scalar plans, host finalize overlapped with
    device compute) against K serial msm_device runs, verifying every
    result against pinned known-k goldens.
    """
    import jax.numpy as jnp

    from webgpu_msm_bls12_377_tpu.harness import testdata

    power = int(np.log2(n))
    assert (1 << power) == n, "--n must be a power of two in batch mode"
    # the pipelined schedule below IS the stream batch path; refuse
    # configurations it cannot honor instead of silently running it
    if args.sharded:
        sys.exit("--batch with --sharded: use engine.compute_msm_batch "
                 "(serial sharded runs); the pipelined bench is "
                 "single-chip")
    if engine._select_smvp(chunk_size, n) not in ("stream", "tree"):
        sys.exit(f"--batch requires the streamed SMVP path "
                 f"(smvp_mode={args.smvp_mode!r}, chunk_size={chunk_size} "
                 f"resolves to {engine._select_smvp(chunk_size, n)!r})")
    k = args.batch
    case = testdata.make_batch_case(curve, power, k)
    pw_dev = jnp.asarray(case.point_words)
    np.asarray(pw_dev[0, 0, :1])
    if args.batch_host_inputs:
        # production-shaped protocol: scalar sets arrive from the host
        # per set; the pipelined batch overlaps set i+1's host->device
        # transfer with set i's compute (transfers ride the tunnel at
        # ~60 MB/s here — comparable to the MSM itself at 2^20)
        sw_srcs = [np.ascontiguousarray(s) for s in case.scalar_sets]
    else:
        sw_srcs = [jnp.asarray(s) for s in case.scalar_sets]
        for s in sw_srcs:
            np.asarray(s[0, :1])  # fence staging

    def serial():
        t0 = time.perf_counter()
        results = []
        for sw in sw_srcs:
            coords = engine.msm_device(pw_dev, sw, chunk_size)
            coords = tuple(np.asarray(c) for c in coords)
            results.append(engine._finalize(coords, chunk_size))
        return results, time.perf_counter() - t0

    batch_impl = (
        engine._msm_batch_tree
        if engine._select_smvp(chunk_size, n) == "tree"
        else engine._msm_batch_stream
    )

    def batched():
        t0 = time.perf_counter()
        results = batch_impl(pw_dev, sw_srcs, chunk_size)
        return results, time.perf_counter() - t0

    # cold (compile) passes first, then timed warm passes
    res_b, _ = batched()
    res_s, _ = serial()
    warm_b = [batched()[1] for _ in range(args.runs)]
    warm_s = [serial()[1] for _ in range(args.runs)]

    if not args.no_check:
        for res in (res_b, res_s):
            for got, want in zip(res, case.expecteds):
                assert (got["x"], got["y"]) == want, "batch MSM mismatch!"

    tb, ts = float(np.mean(warm_b)), float(np.mean(warm_s))
    throughput = k * n / tb
    print(
        json.dumps(
            {
                "metric": f"msm_batch{k}_throughput_2^{power}_{args.curve}",
                "value": round(throughput, 1),
                "unit": "points/s",
                "vs_baseline": round(
                    throughput / BASELINE_POINTS_PER_SEC, 3
                ),
                "detail": {
                    "n": n,
                    "batch": k,
                    "batched_s": round(tb, 4),
                    "serial_s": round(ts, 4),
                    "speedup_vs_serial": round(ts / tb, 3),
                    "host_inputs": bool(args.batch_host_inputs),
                    "runs": args.runs,
                    "checked": not args.no_check,
                },
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--chunk-size", type=int, default=None)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--same-point", action="store_true",
                    help="round-1 protocol: every point is the generator "
                         "(permutation-blind check; default is distinct "
                         "points vs a pinned golden)")
    ap.add_argument("--zipf", type=int, default=None, metavar="POOL_BITS",
                    help="duplicate-heavy protocol: scalars drawn "
                         "zipf(1.2) from a pool of 2^POOL_BITS values "
                         "over the distinct point set (the reference's "
                         "preaggregation / load-imbalance regime)")
    ap.add_argument("--smvp-mode", default="auto",
                    choices=["auto", "stream", "fused", "legacy",
                             "stream-interpret", "interpret",
                             "tree", "tree-interpret"])
    ap.add_argument("--tree-finish", type=int, default=None, metavar="K",
                    help="tree mode: run K pairwise levels, then the "
                         "packed stream finish (default: every level)")
    ap.add_argument("--batch", type=int, default=0, metavar="K",
                    help="batched-pipelined mode (BASELINE config 5): K "
                         "scalar sets over one fixed point set; reports "
                         "batch throughput and the speedup vs K serial "
                         "runs")
    ap.add_argument("--batch-host-inputs", action="store_true",
                    help="batch mode with scalar sets starting host-side "
                         "(production protocol): the pipelined batch "
                         "overlaps transfers with compute, serial pays "
                         "transfer + compute per set")
    ap.add_argument("--sharded", action="store_true",
                    help="shard over all local devices via the mesh engine")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one warm run")
    ap.add_argument("--debug", action="store_true",
                    help="full-scale per-stage differential check before "
                         "timing (the reference's debug=true readbacks, "
                         "submission.ts:464-798): stage outputs at the "
                         "real n vs independent numpy/bigint models")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile the size class in a background thread "
                         "while inputs stage (serving mode); reports the "
                         "compile time NOT hidden behind staging")
    args = ap.parse_args()

    import jax

    # Fail fast if the device backend is unreachable (this environment's
    # axon relay can die; jax.devices() then blocks forever).  A probe
    # thread with a deadline turns an indefinite hang into a recorded
    # error artifact.
    import threading

    probe_ok: list = []
    probe = threading.Thread(
        target=lambda: probe_ok.append(len(jax.devices())), daemon=True
    )
    probe.start()
    probe.join(180)
    if not probe_ok:
        print(
            json.dumps(
                {
                    "metric": "msm_throughput",
                    "value": 0,
                    "unit": "points/s",
                    "vs_baseline": 0,
                    "error": "device backend unreachable after 180s "
                             "(axon relay down?)",
                }
            )
        )
        return 2

    # Persistent compile cache: cold runs reuse executables across processes
    cache_dir = os.environ.get(
        "MSM_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from webgpu_msm_bls12_377_tpu.models.cuzk import (
        CuzkMsmEngine,
        choose_chunk_size,
    )
    from webgpu_msm_bls12_377_tpu.ops.convert import ints_to_words
    from webgpu_msm_bls12_377_tpu.params import CurveId
    from webgpu_msm_bls12_377_tpu.reference import curve as crv

    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    n = args.n
    chunk_size = args.chunk_size or choose_chunk_size(n)

    # --- inputs
    expected_case = None
    if args.zipf is not None:
        from webgpu_msm_bls12_377_tpu.harness import testdata

        power = int(np.log2(n))
        assert (1 << power) == n, "--n must be a power of two with --zipf"
        case = testdata.make_zipf_case(curve, power, pool_bits=args.zipf)
        point_words, scalar_words = case.point_words, case.scalar_words
        expected_case = case.expected
        print(f"# zipf case 2^{power}: pool=2^{args.zipf} alpha=1.2",
              flush=True)
    elif args.same_point:
        # round-1 protocol: fixed generator point, random scalars
        if curve == CurveId.BLS12_377:
            gx, gy = crv.g1_to_affine(crv.G1_GENERATOR)
            coord_words = 12
        else:
            gx, gy = crv.ed_to_affine(crv.ED_GENERATOR)
            coord_words = 8
        base = np.stack([ints_to_words([gx], coord_words),
                         ints_to_words([gy], coord_words)])
        point_words = np.broadcast_to(base, (2, coord_words, n)).copy()
        rng = np.random.RandomState(42)
        scalar_words = rng.randint(0, 1 << 32, size=(8, n), dtype=np.uint64)
        scalar_words = scalar_words.astype(np.uint32)
        scalar_words[7] &= 0x1FFFFFFF  # < 2^253: signed-carry guarantee
    else:
        from webgpu_msm_bls12_377_tpu.harness import testdata

        power = int(np.log2(n))
        assert (1 << power) == n, "--n must be a power of two (or use --same-point)"
        case = testdata.make_bench_case(curve, power)
        point_words, scalar_words = case.point_words, case.scalar_words
        expected_case = case.expected
        print(
            f"# distinct-point case 2^{power}: golden_pinned="
            f"{case.golden_pinned} oracle_checked={case.oracle_checked}",
            flush=True,
        )

    if args.sharded:
        from webgpu_msm_bls12_377_tpu.parallel.mesh import ShardedMsmEngine
        engine = ShardedMsmEngine(curve, chunk_size=chunk_size)
    else:
        engine = CuzkMsmEngine(
            curve, chunk_size=chunk_size, smvp_mode=args.smvp_mode,
            tree_finish=args.tree_finish,
        )

    if args.batch:
        return bench_batch(args, curve, n, chunk_size, engine)

    # Stage inputs on-device once: this environment's TPU is behind a
    # tunnel moving ~60 MB/s, so per-run host->device transfer would
    # dominate (2.2 s at 2^20) and measure the tunnel, not the MSM.
    # Reported separately as transfer_s.
    import jax.numpy as jnp

    warm_thread = None
    if args.prewarm:
        # serving mode: size classes are known ahead of time, so compile
        # in the background while inputs stage (engine.prewarm docstring)
        t_pw = time.perf_counter()
        warm_thread = engine.prewarm(n, chunk_size, background=True)

    t0 = time.perf_counter()
    pw_dev = jnp.asarray(point_words)
    sw_dev = jnp.asarray(scalar_words)
    np.asarray(pw_dev[0, 0, :1]), np.asarray(sw_dev[0, :1])  # fence
    transfer_s = time.perf_counter() - t0
    prewarm_extra_s = None
    if warm_thread is not None:
        warm_thread.join()
        # compile time NOT hidden behind staging (0 = fully overlapped)
        prewarm_extra_s = max(
            0.0, (time.perf_counter() - t_pw) - transfer_s
        )

    if args.debug:
        t0 = time.perf_counter()
        checks = engine.debug_check(point_words, scalar_words, chunk_size)
        print(f"# debug stage checks ({time.perf_counter()-t0:.1f}s): "
              f"{checks}", flush=True)

    def once():
        t0 = time.perf_counter()
        coords = engine.msm_device(pw_dev, sw_dev, chunk_size)
        # hard fence via host readback: on the axon relay platform,
        # block_until_ready can return at enqueue time
        coords = tuple(np.asarray(c) for c in coords)
        t1 = time.perf_counter()
        result = engine._finalize(coords, chunk_size)
        t2 = time.perf_counter()
        return result, t1 - t0, t2 - t1

    result, cold_device_s, host_s = once()
    warm = []
    for _ in range(args.runs):
        result, dev_s, host_s = once()
        warm.append(dev_s + host_s)

    if args.profile:
        # tracing/observability surface (the reference's analogue is the
        # performance.now() harness + CSV export; here: a real device trace)
        with jax.profiler.trace(args.profile):
            once()
        print(f"# profiler trace written to {args.profile}", flush=True)

    if not args.no_check:
        if expected_case is not None:
            want = expected_case  # pinned distinct-point golden
        else:
            scalars = [
                sum(int(scalar_words[i, j]) << (32 * i) for i in range(8))
                for j in range(n)
            ]
            total = sum(scalars)
            if curve == CurveId.BLS12_377:
                want = crv.g1_to_affine(
                    crv.g1_scalar_mult(crv.G1_GENERATOR, total)
                )
            else:
                want = crv.ed_to_affine(
                    crv.ed_scalar_mult(crv.ED_GENERATOR, total)
                )
        assert (result["x"], result["y"]) == want, "MSM result mismatch!"

    mean_warm = float(np.mean(warm))
    throughput = n / mean_warm
    print(
        json.dumps(
            {
                "metric": f"msm_throughput_2^{int(np.log2(n))}_{args.curve}",
                "value": round(throughput, 1),
                "unit": "points/s",
                "vs_baseline": round(throughput / BASELINE_POINTS_PER_SEC, 3),
                "detail": {
                    "n": n,
                    "chunk_size": chunk_size,
                    "mean_warm_s": round(mean_warm, 4),
                    "cold_s": round(cold_device_s, 2),
                    "host_finalize_s": round(host_s, 4),
                    "input_transfer_s": round(transfer_s, 3),
                    **(
                        {"prewarm_extra_s": round(prewarm_extra_s, 2)}
                        if prewarm_extra_s is not None
                        else {}
                    ),
                    "runs": args.runs,
                    "device": str(jax.devices()[0].platform),
                    "n_devices": len(jax.devices()) if args.sharded else 1,
                    "checked": not args.no_check,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
