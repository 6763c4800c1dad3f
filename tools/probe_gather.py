"""Dissect gather_slabs cost at 2^20 on the real TPU.

Times each sub-piece of the slab gather separately (floor-corrected,
single-leaf fence) to find where the ~420 ms goes and whether the big
row gather scales with row width (decides a packed-row redesign).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from webgpu_msm_bls12_377_tpu.harness import testdata
from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine, SCALAR_BITS
from webgpu_msm_bls12_377_tpu.ops import smvp_stream as ss
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
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << power
    chunk = 16

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"floor={floor*1e3:.1f} ms", flush=True)

    case = testdata.make_bench_case(CurveId.BLS12_377, power)
    eng = CuzkMsmEngine(CurveId.BLS12_377, smvp_mode="stream")
    pw = jax.device_put(jnp.asarray(case.point_words))
    sw = jax.device_put(jnp.asarray(case.scalar_words))
    table = jax.jit(eng._build_stream_pprep_fn())(pw)
    sorted_vals, layout = jax.jit(eng._build_stream_splan_fn(chunk))(sw)
    s_slabs = ss.slab_class(int(np.asarray(layout.total_slabs)), n)
    nb_total = layout.starts_rk.shape[0]
    print(f"s_slabs={s_slabs} table={table.shape} {table.nbytes/1e6:.0f} MB",
          flush=True)

    def maps_only(lay):
        sl = jnp.arange(s_slabs, dtype=jnp.int32)
        active = sl < lay.total_slabs
        bid = (
            jnp.zeros((s_slabs,), jnp.int32)
            .at[lay.osl[1:]].add(1, mode="drop").cumsum()
        )
        bid = jnp.minimum(bid, nb_total - 1)
        t = sl - jnp.take(lay.osl, bid)
        first = ((t == 0) & active).astype(jnp.int32)
        outb = jnp.where(active, bid, nb_total - 1)
        return bid, t, first, outb, active

    t_maps = timeit(jax.jit(maps_only), layout)
    print(f"maps (bid/outb/first) {t_maps*1e3:8.1f} ms", flush=True)

    bid, t, first, outb, active = jax.jit(maps_only)(layout)

    def srcidx(lay, bid, t, active):
        s_rows = jnp.take(lay.starts_rk, bid, axis=0)
        l_rows = jnp.take(lay.lens_rk, bid, axis=0)
        valid = active[:, None] & (t[:, None] < l_rows)
        src = s_rows + jnp.minimum(t[:, None], l_rows - 1)
        return jnp.where(valid, src, 0), valid

    t_src = timeit(jax.jit(srcidx), layout, bid, t, active)
    print(f"layout-row takes+src  {t_src*1e3:8.1f} ms", flush=True)
    src, valid = jax.jit(srcidx)(layout, bid, t, active)

    def sv_gather(sv_arr, src, valid):
        sv = jnp.take(sv_arr, src.reshape(-1))
        idx = sv & ss.IDX_MASK
        neg = 1 - ((sv >> ss.SIGN_BIT) & 1)
        return jnp.where(valid.reshape(-1), idx + neg * n, 2 * n)

    t_sv = timeit(jax.jit(sv_gather), sorted_vals, src, valid)
    print(f"sorted_vals gather    {t_sv*1e3:8.1f} ms "
          f"({src.size} elts)", flush=True)
    idx2 = jax.jit(sv_gather)(sorted_vals, src, valid)

    for width in (64, 32, 16, 8):
        tb = table[:, :width] if width < 64 else table
        tb = jax.device_put(np.asarray(tb))  # materialized, contiguous
        t_row = timeit(
            jax.jit(lambda tb, i: jnp.take(tb, i, axis=0)), tb, idx2
        )
        gb = idx2.size * width * 4 / 1e9
        print(f"row gather w={width:3d}      {t_row*1e3:8.1f} ms "
              f"({gb:.2f} GB out, {gb/max(t_row-floor,1e-9):.0f} GB/s)",
              flush=True)

    # transposed output variant: gather rows then transpose (the real
    # pipeline needs (CWP, S*L)); check the .T cost on the big array
    t_rowT = timeit(
        jax.jit(lambda tb, i: jnp.take(tb, i, axis=0).T), table, idx2
    )
    print(f"row gather 64 + .T    {t_rowT*1e3:8.1f} ms", flush=True)

    t_full = timeit(
        jax.jit(lambda tb, sv, lay: ss.gather_slabs(tb, sv, lay, s_slabs)),
        table, sorted_vals, layout,
    )
    print(f"full gather_slabs     {t_full*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
