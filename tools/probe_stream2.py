"""Dispatch-floor-corrected probes for the streamed SMVP design.

tools/probe_stream.py's single-dispatch timings are dominated by this
platform's ~25-31 ms dispatch+readback floor (a tiny fenced add costs
30.8 ms; a 2 GB HBM copy costs 31.5 ms).  Every probe here repeats the
op K times INSIDE one jitted program (chained through cheap xors /
distinct constants so XLA cannot CSE or DCE the repeats) and reports
(T - floor) / K.

Run:  python tools/probe_stream2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 8  # in-dispatch repetitions


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timeit(fn, *args, n=3):
    out = fn(*args)
    fence(out)
    del out
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        fence(out)
        del out
    return (time.perf_counter() - t0) / n


def measure_floor():
    tiny = jnp.ones((8, 128), jnp.uint32)
    inc = jax.jit(lambda x: x + 1)
    return timeit(inc, tiny, n=6)


def main():
    print(f"backend: {jax.default_backend()}")
    floor = measure_floor()
    print(f"dispatch floor: {floor*1e3:.1f} ms")

    n = 1 << 20
    rows = int(n * 1.05) & ~8191
    total_entries = 16 * n

    # --- row pre-gather, K reps chained by xor
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (rows,), 0, n, dtype=jnp.int32
    )
    for cw in (64, 128):
        tbl = jax.jit(
            lambda cw=cw: (
                jax.lax.broadcasted_iota(jnp.uint32, (n, cw), 0) * 131
            )
            & 8191
        )()

        def rep_take(t, i):
            acc = jnp.zeros((rows, t.shape[1]), jnp.uint32)
            for k in range(K):
                acc = acc ^ jnp.take(t, i ^ k, axis=0)
            return acc

        f = jax.jit(rep_take)
        dt = (timeit(f, tbl, idx) - floor) / K
        print(
            f"row gather {rows/1e6:.1f}M x {cw*4}B: {dt*1e3:.2f} ms/rep "
            f"({dt/rows*1e9:.2f} ns/row, {rows*cw*4/dt/1e9:.0f} GB/s)"
        )
        del tbl

    # --- element gather from 16M table
    sv = jax.jit(
        lambda: jax.lax.broadcasted_iota(jnp.int32, (total_entries, 1), 0)[
            :, 0
        ]
    )()
    src = jax.random.randint(
        jax.random.PRNGKey(5), (rows,), 0, total_entries, jnp.int32
    )

    def rep_take1(t, i):
        acc = jnp.zeros((rows,), jnp.int32)
        for k in range(K):
            acc = acc ^ jnp.take(t, i ^ k)
        return acc

    f = jax.jit(rep_take1)
    dt = (timeit(f, sv, src) - floor) / K
    print(
        f"element gather {rows/1e6:.1f}M from 16M: {dt*1e3:.2f} ms/rep "
        f"({dt/rows*1e9:.2f} ns/elt)"
    )
    del sv, src

    # --- XLA transpose
    big = jax.jit(
        lambda: (jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0) * 7)
        & 8191
    )()

    def rep_tr(x):
        acc = jnp.zeros((128, rows), jnp.uint32)
        for k in range(K):
            acc = acc ^ (x ^ k).T
        return acc

    f = jax.jit(rep_tr)
    dt = (timeit(f, big) - floor) / K
    print(
        f"XLA transpose {rows/1e6:.1f}M x 128: {dt*1e3:.2f} ms/rep "
        f"({rows*128*4*2/dt/1e9:.0f} GB/s)"
    )
    del big

    # --- stream kernel skeleton (pre-T and in-kernel-T), K reps with
    # distinct prefetch constants so calls are not CSE'd
    lanes, r_tile = 256, 8
    for cw in (64, 128):
        for transposed in (True, False):
            total_rows = (rows // (lanes * r_tile)) * (lanes * r_tile)
            grid = total_rows // (lanes * r_tile)
            tiles_per_block = 2
            nb = max(1, grid // tiles_per_block)

            def mk_call():
                def kernel(off_ref, outb_ref, first_ref, data_ref, out_ref):
                    i = pl.program_id(0)
                    acc = jnp.where(
                        first_ref[i] == 1,
                        jnp.zeros((cw, lanes), jnp.uint32),
                        out_ref[...],
                    )
                    for r in range(r_tile):
                        if transposed:
                            slab = data_ref[:, r * lanes : (r + 1) * lanes]
                        else:
                            slab = jnp.swapaxes(
                                data_ref[r * lanes : (r + 1) * lanes, :],
                                0,
                                1,
                            )
                        m = slab[cw - 1 : cw, :]
                        acc = acc + slab * m
                    out_ref[...] = acc

                if transposed:
                    in_spec = pl.BlockSpec(
                        (cw, lanes * r_tile),
                        lambda i, off, outb, first: (0, off[i]),
                    )
                else:
                    in_spec = pl.BlockSpec(
                        (lanes * r_tile, cw),
                        lambda i, off, outb, first: (off[i], 0),
                    )
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(grid,),
                    in_specs=[in_spec],
                    out_specs=pl.BlockSpec(
                        (cw, lanes), lambda i, off, outb, first: (0, outb[i])
                    ),
                )
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct(
                        (cw, nb * lanes), jnp.uint32
                    ),
                )

            call = mk_call()
            shape = (cw, total_rows) if transposed else (total_rows, cw)
            data = jax.jit(
                lambda shape=shape: (
                    jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * 7
                )
                & 8191
            )()
            off_np = np.arange(grid, dtype=np.int32)
            outb_np = np.minimum(
                np.arange(grid) // tiles_per_block, nb - 1
            ).astype(np.int32)
            first_np = (np.arange(grid) % tiles_per_block == 0).astype(
                np.int32
            )
            offs = [jnp.asarray(np.roll(off_np, 0) + 0 * k) for k in range(1)]

            def rep_kernel(off, outb, first, d):
                acc = jnp.zeros((cw, nb * lanes), jnp.uint32)
                for k in range(K):
                    # distinct first arrays defeat CSE (k==0 row flipped)
                    fk = first ^ (jnp.arange(grid, dtype=jnp.int32) < 0)
                    acc = acc ^ call(off, outb, fk + k - k, d ^ k)
                return acc

            # simpler CSE defeat: xor the data per rep (costs one BW pass,
            # ~1.4 ms per rep at 550 MB; subtract nothing — report raw)
            f = jax.jit(rep_kernel)
            try:
                dt = (
                    timeit(
                        f,
                        jnp.asarray(off_np),
                        jnp.asarray(outb_np),
                        jnp.asarray(first_np),
                        data,
                    )
                    - floor
                ) / K
                gb = total_rows * cw * 4 / 1e9
                print(
                    f"stream kernel cw={cw} "
                    f"{'pre-T' if transposed else 'in-kernel-T'}: "
                    f"{dt*1e3:.2f} ms/rep (incl ~{gb/0.7/800:.1f}+ ms xor) "
                    f"-> {gb/dt:.0f} GB/s"
                )
            except Exception as e:  # noqa: BLE001
                print(
                    f"stream kernel cw={cw} transposed={transposed} "
                    f"FAILED: {type(e).__name__}: {str(e)[:200]}"
                )
            del data


if __name__ == "__main__":
    main()
