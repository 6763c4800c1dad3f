"""Probe: can an in-kernel DMA row gather beat (or hide behind) the
level-0 XLA gather?  (round-5, VERDICT #2)

The hybrid tree's two point gathers (level-0 + packed, 212 ms at 2^20)
sit at the machine's random-row latency floor as separate XLA gather
ops.  The only TPU mechanism that could HIDE that latency is DMA/compute
overlap inside one Pallas kernel — which requires the kernel itself to
issue the row reads.  A row gather in-kernel means one async copy PER
ROW (rows are randomly scattered; no contiguity to burst).  This probe
measures:

  1. the XLA take baseline: per-row cost of the production gather
     (random R rows of 256 B from a 2M-row table);
  2. the in-kernel per-row DMA cost: grid steps of 256 single-row
     make_async_copy's with scalar-prefetched row indices, issue-all
     then wait-all (the most favorable schedule: maximum outstanding
     requests per step);
  3. the same kernel with the DMAs replaced by one 256-row contiguous
     copy (the no-gather control, bounding the kernel's own overhead).

If (2) per-row >> (1) per-row, the fused-gather design can never reach
the XLA gather's throughput, let alone hide it — the overlap idea is
dead regardless of scheduling, and the negative result goes to PERF.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 1 << 21  # table rows (2^20 points, signed pairs)
CWP = 128  # u32 words per row (512 B): Mosaic HBM slices need 128-lane alignment
BLOCK = 256  # rows per grid step
STEPS = 512  # gathered rows = 128K (prefetch map must fit 1 MB SMEM)


def fence(x):
    # slice ON DEVICE first: np.asarray of the full array would pull
    # the whole buffer through the ~60 MB/s relay tunnel
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, *args, reps=3):
    fn(*args)  # compile + warm
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best.append(time.perf_counter() - t0)
    return min(best)


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.randint(0, 1 << 32, size=(ROWS, CWP), dtype=np.uint64).astype(
            np.uint32
        )
    )
    idx_full = jnp.asarray(
        rng.randint(0, ROWS, size=(4 * (1 << 20),), dtype=np.int64).astype(
            np.int32
        )
    )  # 4M rows: same per-row regime as the 16.8M production gather
       # at a quarter of the HBM transient (the probe shares the chip
       # with cached bench arrays)
    idx_probe = idx_full[: STEPS * BLOCK]

    # 1. XLA take baseline (the production level-0 gather shape)
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t_take_full = timed(take, table, idx_full)
    n_full = idx_full.shape[0]
    print(
        f"XLA take: {n_full} rows in {t_take_full*1e3:.1f} ms "
        f"= {t_take_full/n_full*1e9:.1f} ns/row"
    )

    # 2. in-kernel per-row DMA gather
    def dma_kernel(idx_ref, tbl_ref, out_ref, scratch, sem):
        def start(l, _):
            r = idx_ref[pl.program_id(0) * BLOCK + l]
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(r, 1), :], scratch.at[pl.ds(l, 1), :], sem
            ).start()
            return 0

        jax.lax.fori_loop(0, BLOCK, start, 0)

        def wait(l, _):
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(0, 1), :], scratch.at[pl.ds(0, 1), :], sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, BLOCK, wait, 0)
        out_ref[...] = scratch[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BLOCK, CWP), lambda i, idx: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, CWP), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dma_gather = pl.pallas_call(
        dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((STEPS * BLOCK, CWP), jnp.uint32),
    )
    t_dma = timed(jax.jit(dma_gather), idx_probe, table)
    n_probe = STEPS * BLOCK
    print(
        f"in-kernel row DMA: {n_probe} rows in {t_dma*1e3:.1f} ms "
        f"= {t_dma/n_probe*1e9:.1f} ns/row"
    )

    # 3. contiguous-copy control (kernel overhead without the gather)
    def ctrl_kernel(idx_ref, tbl_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(pl.program_id(0) * BLOCK, BLOCK), :],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        out_ref[...] = scratch[...]

    ctrl = pl.pallas_call(
        ctrl_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLOCK, CWP), lambda i, idx: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((BLOCK, CWP), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((STEPS * BLOCK, CWP), jnp.uint32),
    )
    t_ctrl = timed(jax.jit(ctrl), idx_probe, table)
    print(
        f"contiguous control: {n_probe} rows in {t_ctrl*1e3:.1f} ms "
        f"= {t_ctrl/n_probe*1e9:.1f} ns/row"
    )
    per_row_dma = (t_dma - t_ctrl) / n_probe
    print(
        f"net per-row DMA issue+latency: {per_row_dma*1e9:.1f} ns "
        f"-> 16.8M rows = {per_row_dma*16.8e6*1e3:.0f} ms "
        f"(XLA gather does it in ~{t_take_full/n_full*16.8e6*1e3:.0f} ms)"
    )


if __name__ == "__main__":
    main()
