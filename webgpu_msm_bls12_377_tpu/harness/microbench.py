"""Field/point microbenchmarks — parity with the reference's shader tables.

The reference benchmarks its three Montgomery algorithm families as
standalone shaders and publishes per-device tables (README.md:398-430,
BASELINE.md).  This is the TPU counterpart: per-op steady-state timings
for the Montgomery product, Barrett multiply, and the fused point kernels,
with a hard host-readback fence (the axon relay's block_until_ready can
return at enqueue time).

Run: python -m webgpu_msm_bls12_377_tpu.harness.microbench --lanes 524288
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import curve as dcurve
from ..ops import field as dfield
from ..ops import pallas_kernels as pk
from ..params import CurveId


def _fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[..., :1])


def _time(fn, args, iters):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters


def run(curve: CurveId, lanes: int, iters: int):
    ctx = dfield.field_ctx(curve)
    group = dcurve.group_ops(curve)
    w = ctx.num_words
    key = np.random.RandomState(11)
    mk = lambda: jnp.asarray(
        key.randint(0, ctx.mask + 1, (w, lanes)).astype(np.uint32)
    )
    x, y = mk(), mk()
    point = group.Point(*(mk() for _ in group.zero((1,))))
    aff = tuple(mk() for _ in range(group.AFFINE_COORDS))
    sign = jnp.asarray(key.randint(0, 2, lanes).astype(bool))
    valid = jnp.ones(lanes, bool)

    results = {}
    jit = jax.jit
    results["mont_mul_xla"] = _time(
        jit(lambda a, b: dfield.mont_mul(ctx, a, b)), (x, y), iters
    )
    results["barrett_mul_xla"] = _time(
        jit(lambda a, b: dfield.barrett_mul(ctx, a, b)), (x, y), iters
    )
    results["point_add_xla"] = _time(jit(group.add), (point, point), iters)
    results["masked_add_mixed_pallas"] = _time(
        jit(lambda p, a, s, v: pk.masked_add_mixed(group, p, a, s, v)),
        (point, aff, sign, valid),
        iters,
    )
    results["add_pallas"] = _time(
        jit(lambda a, b: pk.fused_add(group, a, b)), (point, point), iters
    )
    results["double_and_add_step_pallas"] = _time(
        jit(lambda r, t, b: pk.masked_add_and_double(group, r, t, b)),
        (point, point, sign),
        iters,
    )

    out = {
        "curve": curve.value,
        "lanes": lanes,
        "word_size": ctx.word_size,
        "num_words": w,
        "device": jax.devices()[0].platform,
    }
    for k, v in results.items():
        out[k] = {
            "ms": round(v * 1000, 3),
            "M_ops_per_s": round(lanes / v / 1e6, 2),
        }
    return out


def limb_study(curve: CurveId, lanes: int, iters: int, chain: int = 16):
    """Device limb-width study: mont_mul at w in {12..15}.

    Redoes the reference's word-size shader study (README.md:386-430) for
    the TPU VPU.  Each timing runs ``chain`` dependent Montgomery products
    inside ONE jitted program (z <- mont_mul(z, y): serialized, un-CSE-able)
    and divides out the chain length, so this platform's ~25-30 ms
    dispatch+readback floor pollutes the number by <1% instead of
    dominating it (see PERF.md on round-1's floor-polluted gather figure).
    """
    key = np.random.RandomState(7)
    rows = {
        "curve": curve.value,
        "lanes": lanes,
        "chain": chain,
        "device": jax.devices()[0].platform,
        "widths": {},
    }
    for word_size in (12, 13, 14, 15):
        ctx = dfield.field_ctx(curve, word_size=word_size)
        w = ctx.num_words
        mk = lambda: jnp.asarray(
            key.randint(0, ctx.mask + 1, (w, lanes)).astype(np.uint32)
        )
        x, y = mk(), mk()

        def chained(a, b):
            z = a
            for _ in range(chain):
                z = dfield.mont_mul(ctx, z, b)
            return z

        dt = _time(jax.jit(chained), (x, y), iters) / chain
        rows["widths"][word_size] = {
            "num_words": w,
            "carry_free": ctx.params.nsafe >= w,
            "ms": round(dt * 1000, 3),
            "M_mont_per_s": round(lanes / dt / 1e6, 2),
            "ns_per_lane": round(dt / lanes * 1e9, 3),
        }
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1 << 19)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--curve", default="bls12_377",
                    choices=["bls12_377", "edwards_bls12"])
    ap.add_argument("--limb-study", action="store_true",
                    help="mont_mul word-size study (w=12..15), "
                         "floor-corrected chained timing")
    args = ap.parse_args()
    curve = (
        CurveId.BLS12_377 if args.curve == "bls12_377"
        else CurveId.EDWARDS_BLS12
    )
    if args.limb_study:
        print(json.dumps(limb_study(curve, args.lanes, args.iters), indent=2))
        return
    print(json.dumps(run(curve, args.lanes, args.iters), indent=2))


if __name__ == "__main__":
    main()
