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


#: mtime-validated cache of the loaded table: engines consult the table
#: on EVERY compute_msm (autotune is on by default), so the lookup must
#: not cost a file parse per call
_TABLE_CACHE: dict = {"path": None, "mtime": None, "table": None}


def load_table(path: str | None = None) -> dict:
    path = path or _table_path()
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        return {}
    c = _TABLE_CACHE
    if c["path"] == path and c["mtime"] == mtime:
        return c["table"]
    try:
        with open(path) as f:
            table = json.load(f)
    except (OSError, ValueError):
        return {}
    c.update(path=path, mtime=mtime, table=table)
    return table


def save_table(table: dict, path: str | None = None) -> None:
    path = path or _table_path()
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _TABLE_CACHE.update(
        path=path, mtime=os.stat(path).st_mtime_ns, table=table
    )


def lookup_entry(curve, n: int, table: dict | None = None) -> dict:
    """Full tuned entry for this device/curve/n ({} if untuned).

    Keys the engine consults (each optional):
      chunk: window size (choose_chunk_size override);
      smvp: "tree" | "stream" (the auto tree/stream boundary override);
      tree_finish: hybrid finish level K (the measured-best default
        is K=2; other devices may prefer a different split).
    """
    table = load_table() if table is None else table
    entry = table.get(_device_key(), {}).get(curve.name, {})
    return entry.get(str(int(n)), {})


def lookup(curve, n: int, table: dict | None = None) -> int | None:
    """Tuned chunk size for this device/curve/n, or None if untuned."""
    return lookup_entry(curve, n, table).get("chunk")


def _measure(engine_cls, curve, n: int, chunk: int, runs: int, measure_fn):
    """One verified timing; measure_fn is injectable for tests."""
    return measure_fn(engine_cls, curve, n, chunk, runs)


def _timed_runs(eng, case, chunk: int, runs: int, what: str) -> float:
    """Cold-compile then `runs` fenced warm runs of the device pipeline,
    oracle-verified once; returns the best warm time."""
    import jax.numpy as jnp

    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))
    coords = eng.msm_device(pw, sw, chunk)  # cold (compile)
    result = eng._finalize(coords, chunk)
    if (result["x"], result["y"]) != tuple(case.expected):
        raise AssertionError(
            f"{what} produced a WRONG result — disqualified"
        )
    best = []
    for _ in range(runs):
        t0 = time.perf_counter()
        coords = eng.msm_device(pw, sw, chunk)
        np.asarray(jax.tree_util.tree_leaves(coords)[-1][:1, :1])  # fence
        best.append(time.perf_counter() - t0)
    return min(best)


def _default_measure(engine_cls, curve, n, chunk, runs):
    """Chunk-size timing on a generated distinct-point case.

    autotune=False: an engine under measurement must not consult the
    table being written."""
    from . import testdata

    case = testdata.make_bench_case(curve, int(np.log2(n)))
    eng = engine_cls(curve, chunk_size=chunk, autotune=False)
    return _timed_runs(eng, case, chunk, runs, f"chunk {chunk} at n={n}")


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
    # smaller window -> more windows -> bigger device footprint: run the
    # big candidates LAST so an OOM disqualifies only itself (a failed
    # giant allocation can leave the client unable to serve the NEXT
    # candidate in this process — observed: chunk 13 at 2^20 OOMs, then
    # 15/16 fail too if run after it)
    for c in sorted(candidates, reverse=True):
        # the streamed path needs >= LANES bucket lanes per window;
        # backend suitability is the engine's own auto dispatch
        if n >= 65536 and (1 << (c - 1)) % LANES != 0:
            continue
        try:
            results[c] = _measure(
                CuzkMsmEngine, curve, n, c, runs, measure_fn
            )
        except AssertionError:
            raise  # a WRONG result must crash the tuning run
        except Exception as e:  # OOM/compile failure = disqualified
            # (chunk 13 at 2^20 exceeds the 16 GB HBM envelope:
            # 20 windows x 2^20 entries)
            print(f"  chunk {c}: disqualified ({type(e).__name__})")
        finally:
            import gc

            gc.collect()
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


#: SMVP-path candidates: (smvp_mode, tree_finish).  "tree" + K is the
#: hybrid (K pairwise levels + packed stream finish); "tree" + None is
#: the pure tree; "stream" is the slab-stream kernel.
SMVP_CANDIDATES = (("stream", None), ("tree", 1), ("tree", 2), ("tree", 3))


def _default_measure_smvp(curve, n, chunk, smvp, tree_finish, runs):
    from . import testdata
    from ..models.cuzk import CuzkMsmEngine

    case = testdata.make_bench_case(curve, int(np.log2(n)))
    eng = CuzkMsmEngine(
        curve, chunk_size=chunk, smvp_mode=smvp, tree_finish=tree_finish,
        autotune=False,
    )
    return _timed_runs(
        eng, case, chunk, runs, f"smvp {smvp}/K={tree_finish} at n={n}"
    )


def autotune_smvp(
    curve,
    n: int,
    chunk: int | None = None,
    candidates=SMVP_CANDIDATES,
    runs: int = 2,
    measure_fn=_default_measure_smvp,
    persist: bool = True,
):
    """Measure SMVP-path candidates (stream vs tree, and the hybrid
    finish level K) on the live device; persist and return the winner.

    The static tree/stream boundary (n >= 2^18) and tree_finish K=2 are
    one device's A/B results frozen into code — this measures them on
    THIS device.  Every run is oracle-verified.  Returns the winning
    (smvp_mode, tree_finish) pair.
    """
    from ..models.cuzk import choose_chunk_size
    from ..ops.smvp_stream import stream_supported
    from ..ops.smvp_tree import tree_supported

    chunk = chunk or lookup(curve, n) or choose_chunk_size(n)
    results = {}
    for smvp, k in candidates:
        if not stream_supported(chunk, False):
            continue  # both paths ride the stream block shapes
        if smvp == "tree" and not tree_supported(False):
            continue
        try:
            results[(smvp, k)] = measure_fn(curve, n, chunk, smvp, k, runs)
        except AssertionError:
            raise  # a WRONG result must crash the tuning run
        except Exception as e:  # OOM/compile failure = disqualified
            print(f"  smvp {smvp}/K={k}: disqualified ({type(e).__name__})")
        finally:
            import gc

            gc.collect()
    if not results:
        raise ValueError(
            f"no viable SMVP candidates for n={n}, chunk={chunk}"
        )
    winner = min(results, key=results.get)
    if persist:
        table = load_table()
        entry = (
            table.setdefault(_device_key(), {})
            .setdefault(curve.name, {})
            .setdefault(str(int(n)), {})
        )
        entry["smvp"], entry["tree_finish"] = winner[0], winner[1]
        entry["smvp_warm_s"] = {
            f"{m}-K{k}": round(t, 4) for (m, k), t in results.items()
        }
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
    ap.add_argument("--tune", default="all",
                    choices=["chunk", "smvp", "all"])
    args = ap.parse_args()
    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    for p in args.powers:
        if args.tune in ("chunk", "all"):
            w = autotune_chunk(
                curve, 1 << p, candidates=tuple(args.candidates),
                runs=args.runs,
            )
            print(f"2^{p} {args.curve}: chunk {w} (table: {_table_path()})")
        if args.tune in ("smvp", "all"):
            m, k = autotune_smvp(curve, 1 << p, runs=args.runs)
            print(f"2^{p} {args.curve}: smvp {m} tree_finish={k}")


if __name__ == "__main__":
    main()
