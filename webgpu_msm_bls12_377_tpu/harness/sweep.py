"""Scripted benchmark sweep: cold + warm runs per power, Markdown/CSV out.

Mirrors the reference's full_benchmarks.ts protocol (SURVEY.md §3.4):
for each power 2^16..2^20, one forced-recompile (cold) run, then
num_runs timed warm runs; every result asserted against the expected
value; emits a Markdown table and optional CSV
(full_benchmarks.ts:14-16, 50-58, 128-160).

Round-2 additions:
- distinct-point inputs verified against the pinned golden registry by
  default (testdata.make_bench_case; --same-point restores the round-1
  all-generator protocol, AllBenchmarks.tsx:83-89);
- a scaling-efficiency mode (--devices 1 2 4 8): runs the sharded mesh
  engine at each device count and reports points/s/chip and efficiency
  vs the single-device run — the BASELINE.json scaling metric.  On this
  one-chip environment the D>1 rows run on a virtual CPU mesh (pass
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8);
  the same harness runs unmodified on a real multi-chip slice.

Run: python -m webgpu_msm_bls12_377_tpu.harness.sweep --powers 16 18 20
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..models.cuzk import CuzkMsmEngine, choose_chunk_size
from ..ops.convert import ints_to_words
from ..params import CurveId
from ..reference import curve as ocurve
from . import testdata


def _same_point_inputs(curve, n, rng_seed=42):
    if curve == CurveId.BLS12_377:
        gx, gy = ocurve.g1_to_affine(ocurve.G1_GENERATOR)
        coord_words = 12
    else:
        gx, gy = ocurve.ed_to_affine(ocurve.ED_GENERATOR)
        coord_words = 8
    base = np.stack(
        [ints_to_words([gx], coord_words), ints_to_words([gy], coord_words)]
    )
    point_words = np.broadcast_to(base, (2, coord_words, n)).copy()
    rng = np.random.RandomState(rng_seed)
    scalar_words = rng.randint(0, 1 << 32, size=(8, n), dtype=np.uint64).astype(
        np.uint32
    )
    scalar_words[7] &= 0x1FFFFFFF

    total = int(
        sum(
            sum(int(scalar_words[i, j]) << (32 * i) for i in range(8))
            for j in range(n)
        )
    )
    if curve == CurveId.BLS12_377:
        want = ocurve.g1_to_affine(
            ocurve.g1_scalar_mult(ocurve.G1_GENERATOR, total)
        )
    else:
        want = ocurve.ed_to_affine(
            ocurve.ed_scalar_mult(ocurve.ED_GENERATOR, total)
        )
    return point_words, scalar_words, want


def run_power(engine, curve, power, num_runs, same_point=False):
    n = 1 << power
    if same_point:
        point_words, scalar_words, want = _same_point_inputs(curve, n)
    else:
        case = testdata.make_bench_case(curve, power)
        point_words, scalar_words = case.point_words, case.scalar_words
        want = case.expected

    chunk_size = engine.chunk_size_override or choose_chunk_size(n)

    # stage inputs on-device once (as bench.py: the tunneled host->device
    # path is ~60 MB/s and would swamp the MSM itself)
    import jax.numpy as jnp

    pw_dev = jnp.asarray(point_words)
    sw_dev = jnp.asarray(scalar_words)
    np.asarray(pw_dev[0, 0, :1]), np.asarray(sw_dev[0, :1])

    def once():
        t0 = time.perf_counter()
        coords = engine.msm_device(pw_dev, sw_dev, chunk_size)
        coords = tuple(np.asarray(c) for c in coords)  # hard fence
        result = engine._finalize(coords, chunk_size)
        return result, time.perf_counter() - t0

    result, cold_s = once()
    warm = []
    for _ in range(num_runs):
        result, dt = once()
        warm.append(dt)

    ok = (result["x"], result["y"]) == want

    return {
        "power": power,
        "n": n,
        "cold_s": round(cold_s, 3),
        "warm_s": [round(t, 4) for t in warm],
        "mean_warm_s": round(float(np.mean(warm)), 4),
        "mean_with_cold_s": round(float(np.mean(warm + [cold_s])), 4),
        "points_per_s": round(n / float(np.mean(warm)), 1),
        "verified": ok,
        "distinct_points": not same_point,
    }


def run_scaling(curve, power, num_runs, device_counts, same_point=False):
    """Sharded engine at each device count; efficiency vs the D=1 row.

    efficiency(D) = throughput(D) / (D * throughput(1)) — the BASELINE
    scaling metric (points/s/chip retention).
    """
    import jax

    from ..parallel.mesh import ShardedMsmEngine, make_mesh

    rows = []
    base_per_chip = None  # points/s/chip of the first non-skipped count
    for d in device_counts:
        devices = jax.devices()[:d]
        if len(devices) < d:
            rows.append({"devices": d, "skipped": "not enough devices"})
            continue
        engine = ShardedMsmEngine(curve, mesh=make_mesh(devices))
        row = run_power(engine, curve, power, num_runs, same_point=same_point)
        row["devices"] = d
        tput = row["points_per_s"]
        per_chip = tput / d
        row["points_per_s_per_chip"] = round(per_chip, 1)
        # efficiency = per-chip throughput retention vs the baseline
        # count (NOT tput/(d*base_tput), which double-counts the
        # baseline's own chips when the list doesn't start at D=1)
        if base_per_chip is None:
            base_per_chip = per_chip
            row["efficiency"] = 1.0
        else:
            row["efficiency"] = round(per_chip / base_per_chip, 3)
        rows.append(row)
    return rows


def markdown_table(rows) -> str:
    if rows and "devices" in rows[0]:
        lines = [
            "| devices | power | mean warm (s) | points/s | points/s/chip |"
            " efficiency | verified |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            if "skipped" in r:
                lines.append(f"| {r['devices']} | — skipped: {r['skipped']} |")
                continue
            lines.append(
                f"| {r['devices']} | 2^{r['power']} | {r['mean_warm_s']} | "
                f"{r['points_per_s']} | {r['points_per_s_per_chip']} | "
                f"{r['efficiency']} | {r['verified']} |"
            )
        return "\n".join(lines)
    lines = [
        "| power | n | cold (s) | mean warm (s) | points/s | verified |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| 2^{r['power']} | {r['n']} | {r['cold_s']} | "
            f"{r['mean_warm_s']} | {r['points_per_s']} | {r['verified']} |"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--powers", type=int, nargs="+", default=[16, 17, 18, 19, 20])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--csv", default=None)
    ap.add_argument("--same-point", action="store_true",
                    help="round-1 all-generator inputs (default: distinct "
                         "points vs pinned goldens)")
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="scaling mode: run the sharded engine at these "
                         "device counts and report efficiency")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="pin the jax platform (cpu = the 8-virtual-"
                         "device mesh; env vars alone are ignored on "
                         "this machine's sitecustomize)")
    ap.add_argument("--smvp-mode", default="auto",
                    choices=["auto", "stream", "tree", "fused", "legacy"],
                    help="SMVP stage implementation (A/B sweeps)")
    ap.add_argument("--tree-finish", type=int, default=None, metavar="K",
                    help="tree mode: K pairwise levels then the packed "
                         "stream finish")
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="window size override (default: size policy)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import os as _os

        _flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in _flags:
            _os.environ["XLA_FLAGS"] = (
                _flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    if args.devices:
        rows = run_scaling(
            curve, args.powers[0], args.runs, args.devices,
            same_point=args.same_point,
        )
        for row in rows:
            print(json.dumps(row), flush=True)
        print(markdown_table(rows))
        return

    engine = CuzkMsmEngine(
        curve, chunk_size=args.chunk_size, smvp_mode=args.smvp_mode,
        tree_finish=args.tree_finish,
    )
    rows = []
    for power in args.powers:
        row = run_power(engine, curve, power, args.runs,
                        same_point=args.same_point)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(markdown_table(rows))
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("power,n,cold_s,mean_warm_s,points_per_s,verified\n")
            for r in rows:
                f.write(
                    f"{r['power']},{r['n']},{r['cold_s']},"
                    f"{r['mean_warm_s']},{r['points_per_s']},{r['verified']}\n"
                )


if __name__ == "__main__":
    main()
