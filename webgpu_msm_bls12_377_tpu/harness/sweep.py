"""Scripted benchmark sweep: cold + warm runs per power, Markdown/CSV out.

Mirrors the reference's full_benchmarks.ts protocol (SURVEY.md §3.4):
for each power 2^16..2^20, one forced-recompile (cold) run, then
num_runs timed warm runs; every result asserted against the expected
value; emits a Markdown table and optional CSV
(full_benchmarks.ts:14-16, 50-58, 128-160).

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


def run_power(engine, curve, power, num_runs, rng_seed=42):
    n = 1 << power
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

    chunk_size = choose_chunk_size(n)

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

    # verify: all points are G, so expected = (sum k_i) * G
    total = int(
        sum(
            sum(int(scalar_words[i, j]) << (32 * i) for i in range(8))
            for j in range(n)
        )
    )
    if curve == CurveId.BLS12_377:
        want = ocurve.g1_to_affine(ocurve.g1_scalar_mult(ocurve.G1_GENERATOR, total))
    else:
        want = ocurve.ed_to_affine(ocurve.ed_scalar_mult(ocurve.ED_GENERATOR, total))
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
    }


def markdown_table(rows) -> str:
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
    args = ap.parse_args()

    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    engine = CuzkMsmEngine(curve)
    rows = []
    for power in args.powers:
        row = run_power(engine, curve, power, args.runs)
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
