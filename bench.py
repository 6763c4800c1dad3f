"""Benchmark harness: cuZK MSM throughput on the local device.

Mirrors the reference's scripted sweep protocol
(src/submission/miscellaneous/full_benchmarks.ts:6-166): one cold run
(includes XLA compile, the analogue of the forced-recompile run), then
``--runs`` warm runs; verifies every result against the bigint oracle
(all points are the fixed generator, as in the reference's random input
mode, ui/AllBenchmarks.tsx:83-89, so the expected result is (sum k_i)*G).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--chunk-size", type=int, default=None)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--sharded", action="store_true",
                    help="shard over all local devices via the mesh engine")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one warm run")
    args = ap.parse_args()

    import jax

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

    # --- inputs: fixed generator point, random scalars (reference protocol)
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
    scalar_words[7] &= 0x1FFFFFFF  # scalars < 2^253: signed-carry guarantee

    if args.sharded:
        from webgpu_msm_bls12_377_tpu.parallel.mesh import ShardedMsmEngine
        engine = ShardedMsmEngine(curve, chunk_size=chunk_size)
    else:
        engine = CuzkMsmEngine(curve, chunk_size=chunk_size)

    # Stage inputs on-device once: this environment's TPU is behind a
    # tunnel moving ~60 MB/s, so per-run host->device transfer would
    # dominate (2.2 s at 2^20) and measure the tunnel, not the MSM.
    # Reported separately as transfer_s.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    pw_dev = jnp.asarray(point_words)
    sw_dev = jnp.asarray(scalar_words)
    np.asarray(pw_dev[0, 0, :1]), np.asarray(sw_dev[0, :1])  # fence
    transfer_s = time.perf_counter() - t0

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
        scalars = [
            sum(int(scalar_words[i, j]) << (32 * i) for i in range(8))
            for j in range(n)
        ]
        total = sum(scalars)
        if curve == CurveId.BLS12_377:
            want = crv.g1_to_affine(crv.g1_scalar_mult(crv.G1_GENERATOR, total))
        else:
            want = crv.ed_to_affine(crv.ed_scalar_mult(crv.ED_GENERATOR, total))
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
