"""Interleaved same-process A/B: stream vs tree-hybrid per power.

The axon relay's throughput drifts by >20% across minutes (round-3
verdict weak #7; re-confirmed round 4: stream 2^16 measured 299k and
365k pts/s in one session).  Sequential sweeps therefore cannot rank
modes a few percent apart.  This tool alternates the two engines
RUN-BY-RUN in one process — both size classes compiled first, then
A B A B A B ... — so drift hits both arms equally; reports per-arm
medians and the paired per-alternation ratio (drift-free).

Run: python tools/ab_interleaved.py 16 17 18 19 20 --alternations 5
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("powers", type=int, nargs="+")
    ap.add_argument("--alternations", type=int, default=5)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--tree-finish", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from webgpu_msm_bls12_377_tpu.harness import testdata
    from webgpu_msm_bls12_377_tpu.models.cuzk import (
        CuzkMsmEngine,
        choose_chunk_size,
    )
    from webgpu_msm_bls12_377_tpu.params import CurveId

    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    eng_a = CuzkMsmEngine(curve, smvp_mode="stream")
    eng_b = CuzkMsmEngine(
        curve, smvp_mode="tree", tree_finish=args.tree_finish
    )

    for power in args.powers:
        n = 1 << power
        case = testdata.make_bench_case(curve, power)
        chunk = choose_chunk_size(n)
        pw = jnp.asarray(case.point_words)
        sw = jnp.asarray(case.scalar_words)
        np.asarray(pw[0, 0, :1])

        def once(engine):
            t0 = time.perf_counter()
            coords = engine.msm_device(pw, sw, chunk)
            coords = tuple(np.asarray(c) for c in coords)
            dt = time.perf_counter() - t0
            result = engine._finalize(coords, chunk)
            ok = (result["x"], result["y"]) == case.expected
            return dt, ok

        # compile/warm both arms (not timed)
        once(eng_a)
        once(eng_b)

        ta, tb, ratios, all_ok = [], [], [], True
        for _ in range(args.alternations):
            da, oka = once(eng_a)
            db, okb = once(eng_b)
            ta.append(da)
            tb.append(db)
            ratios.append(da / db)
            all_ok &= oka and okb
        print(json.dumps({
            "power": power,
            "chunk": chunk,
            "stream_median_s": round(float(np.median(ta)), 4),
            "tree_median_s": round(float(np.median(tb)), 4),
            "paired_ratio_stream_over_tree": round(
                float(np.median(ratios)), 4
            ),
            "tree_wins": bool(np.median(ratios) > 1.0),
            "verified": all_ok,
            "stream_runs": [round(t, 4) for t in ta],
            "tree_runs": [round(t, 4) for t in tb],
        }), flush=True)


if __name__ == "__main__":
    main()
