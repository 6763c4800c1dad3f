"""On-device window-size auto-tuning with persisted winners.

The reference picked per-device parameters by benchmarking on each GPU
(limb-width study /root/reference/README.md:386-430, workgroup-size
tuning README.md:533-535) and hardcoding the winners.  This is the
live equivalent for the window (chunk) size: measure the candidate
chunk sizes for a (curve, n) class on the actual attached device,
verify every run against the bigint oracle, persist the winner next to
the executable cache, and let engines consult the table.

The static fallback policy (models/cuzk.py:choose_chunk_size) encodes
the v5e-measured winners (PERF.md round 4); auto-tuning matters on
devices with different dispatch floors / HBM behavior.

Usage:
    python -m webgpu_msm_bls12_377_tpu.harness.autotune --powers 16 20
    # or in code:
    eng = CuzkMsmEngine(curve, autotune=True)   # consults the table

The table lives at ``<repo>/.autotune.json`` (``MSM_AUTOTUNE_DIR``
overrides), keyed by backend / device kind / curve / n.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

DEFAULT_CANDIDATES = (13, 15, 16)  # 12/14 excluded: 1-bit top windows
                                   # are pathological (PERF.md round 4)


def _table_path() -> str:
    d = os.environ.get("MSM_AUTOTUNE_DIR")
    if d is None:
        d = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    return os.path.join(d, ".autotune.json")


def _device_key() -> str:
    dev = jax.devices()[0]
    return f"{jax.default_backend()}/{getattr(dev, 'device_kind', 'unknown')}"


def load_table(path: str | None = None) -> dict:
    path = path or _table_path()
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_table(table: dict, path: str | None = None) -> None:
    path = path or _table_path()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def lookup(curve, n: int, table: dict | None = None) -> int | None:
    """Tuned chunk size for this device/curve/n, or None if untuned."""
    table = load_table() if table is None else table
    entry = table.get(_device_key(), {}).get(curve.name, {})
    return entry.get(str(int(n)), {}).get("chunk")


def _measure(engine_cls, curve, n: int, chunk: int, runs: int, measure_fn):
    """One verified timing; measure_fn is injectable for tests."""
    return measure_fn(engine_cls, curve, n, chunk, runs)


def _default_measure(engine_cls, curve, n, chunk, runs):
    """Cold-compile then `runs` fenced warm runs of the device pipeline
    on a generated distinct-point case, oracle-verified once."""
    import jax.numpy as jnp

    from . import testdata

    case = testdata.make_bench_case(curve, int(np.log2(n)))
    eng = engine_cls(curve, chunk_size=chunk)
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))
    coords = eng.msm_device(pw, sw, chunk)  # cold (compile)
    result = eng._finalize(coords, chunk)
    if (result["x"], result["y"]) != tuple(case.expected):
        raise AssertionError(
            f"chunk {chunk} produced a WRONG result at n={n} — disqualified"
        )
    best = []
    for _ in range(runs):
        t0 = time.perf_counter()
        coords = eng.msm_device(pw, sw, chunk)
        np.asarray(jax.tree_util.tree_leaves(coords)[-1][:1, :1])  # fence
        best.append(time.perf_counter() - t0)
    return min(best)


def autotune_chunk(
    curve,
    n: int,
    candidates=DEFAULT_CANDIDATES,
    runs: int = 2,
    measure_fn=_default_measure,
    persist: bool = True,
) -> int:
    """Measure candidates on the live device; persist and return the winner.

    Every candidate run is oracle-verified — a wrong result disqualifies
    by raising, never by silently recording a fast-but-broken config.
    """
    from ..models.cuzk import CuzkMsmEngine
    from ..ops.smvp_stream import LANES

    results = {}
    for c in candidates:
        # the streamed path needs >= LANES bucket lanes per window;
        # backend suitability is the engine's own auto dispatch
        if n >= 65536 and (1 << (c - 1)) % LANES != 0:
            continue
        results[c] = _measure(CuzkMsmEngine, curve, n, c, runs, measure_fn)
    if not results:
        raise ValueError(f"no viable chunk candidates for n={n}")
    winner = min(results, key=results.get)
    if persist:
        table = load_table()
        entry = (
            table.setdefault(_device_key(), {})
            .setdefault(curve.name, {})
            .setdefault(str(int(n)), {})
        )
        entry["chunk"] = winner
        entry["warm_s"] = {str(c): round(t, 4) for c, t in results.items()}
        save_table(table)
    return winner


def main():
    from ..params import CurveId

    ap = argparse.ArgumentParser()
    ap.add_argument("--powers", type=int, nargs="+", default=[16, 20])
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--candidates", type=int, nargs="+",
                    default=list(DEFAULT_CANDIDATES))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    for p in args.powers:
        w = autotune_chunk(
            curve, 1 << p, candidates=tuple(args.candidates), runs=args.runs
        )
        print(f"2^{p} {args.curve}: chunk {w} (table: {_table_path()})")


if __name__ == "__main__":
    main()
