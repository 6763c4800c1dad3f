"""Probe: fused slab-gather + compute — can per-slab row DMAs issued
from an SMEM-resident index tile overlap with the add kernel's compute?
(round-5, VERDICT #2 follow-up to probe_dma_gather.py)

probe_dma_gather measured in-kernel random row DMAs at ~17 ns/row net —
parity with XLA take at the same 512 B row size.  The packed-finish
gather (gather_packed_slabs, 95 ms at 2^20) feeds a kernel with ~22
ns/row of compute, so a kernel that gathers its OWN slabs could hide
the whole gather behind the adds IF:

  1. the per-slab row-index tile (256 int32) can be DMA'd HBM->SMEM
     inside the kernel (index values must be scalar-readable to drive
     make_async_copy);
  2. the 3-stage software pipeline (idx tile t+2 -> row DMAs t+1 ->
     compute t) actually overlaps: measured step time ~= max(DMA,
     compute), not the sum.

This probe builds exactly that pipeline with a dummy compute load and
reports DMA-only / compute-only / fused step times.
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

ROWS = 1 << 22  # packed-plane rows (level-2 node count class)
CWP = 128  # u32 words per row (512 B, DMA-alignment padded from 96)
LANES = 256  # rows per slab
STEPS = 1024  # slabs probed


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, *args, reps=3):
    fn(*args)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best.append(time.perf_counter() - t0)
    return min(best)


def build(compute_iters: int, do_gather: bool):
    """One kernel: per step, (optionally) gather LANES random rows via
    SMEM-indexed DMAs double-buffered one step ahead, plus
    `compute_iters` dummy vector ops on a VMEM block."""

    def kernel(idx_ref, tbl_ref, out_ref, vtile, smem_idx, sem_i, sem_r):
        i = pl.program_id(0)
        cur = jax.lax.rem(i, 2)
        g = jax.lax.rem(jax.lax.div(i, 8), 2)  # idx GROUP slot (8 tiles)
        r_in = jax.lax.rem(i, 8)

        if do_gather:
            # stage A: idx tiles arrive in GROUPS of 8 rows (HBM tiling
            # makes single (1, 256) int32 slices un-DMA-able: 2-D int32
            # memrefs tile at (8, 128), 1-D at (1024)); one 8 KB
            # HBM->SMEM copy per 8 slabs, double-buffered a group ahead
            @pl.when(i == 0)
            def _():
                cp = pltpu.make_async_copy(
                    idx_ref.at[pl.ds(0, 8), :], smem_idx.at[0], sem_i
                )
                cp.start()
                cp.wait()

            @pl.when((r_in == 0) & (i > 0))
            def _():
                pltpu.make_async_copy(
                    idx_ref.at[pl.ds(0, 8), :], smem_idx.at[0], sem_i
                ).wait()  # the group issued 8 steps ago

            @pl.when((r_in == 0) & (i + 8 < STEPS))
            def _():
                pltpu.make_async_copy(
                    idx_ref.at[pl.ds(pl.multiple_of(i + 8, 8), 8), :],
                    smem_idx.at[jax.lax.rem(g + 1, 2)],
                    sem_i,
                ).start()

            # stage B: issue THIS step's row DMAs from the SMEM tile
            def start(l, _):
                r = smem_idx[g, r_in, l]
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(r, 1), :],
                    vtile.at[cur].at[pl.ds(l, 1), :],
                    sem_r,
                ).start()
                return 0

            jax.lax.fori_loop(0, LANES, start, 0)

        # stage C: dummy compute approximating the masked lazy add
        acc = out_ref[...]
        for _ in range(compute_iters):
            acc = acc * jnp.uint32(0x9E3779B1) + jnp.uint32(1)
        out_ref[...] = acc

        if do_gather:
            # drain this step's row DMAs (overlap window = stage C)
            def wait(l, _):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(0, 1), :],
                    vtile.at[0].at[pl.ds(0, 1), :],
                    sem_r,
                ).wait()
                return 0

            jax.lax.fori_loop(0, LANES, wait, 0)
            out_ref[...] = out_ref[...] ^ vtile[cur, :, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # idx tiles (STEPS, LANES)
            pl.BlockSpec(memory_space=pltpu.ANY),  # table (ROWS, CWP)
        ],
        out_specs=pl.BlockSpec((LANES, CWP), lambda i: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, LANES, CWP), jnp.uint32),
            pltpu.SMEM((2, 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((LANES, CWP), jnp.uint32),
        )
    )


def main():
    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.randint(0, 1 << 32, size=(ROWS, CWP), dtype=np.uint64).astype(
            np.uint32
        )
    )
    idx = jnp.asarray(
        rng.randint(0, ROWS, size=(STEPS, LANES), dtype=np.int64).astype(
            np.int32
        )
    )  # (STEPS, 256): 8-row groups match the (8, 128) HBM int32 tiling

    n_rows = STEPS * LANES
    t_floor = timed(build(0, False), idx, table)  # empty kernel: floor
    t_dma = timed(build(0, True), idx, table)
    d = t_dma - t_floor
    print(f"dispatch+empty floor: {t_floor*1e3:.2f} ms")
    print(
        f"gather-only: {t_dma*1e3:.2f} ms "
        f"(net {d*1e3:.2f} ms = {d/n_rows*1e9:.1f} ns/row)"
    )
    for iters in (8, 16, 32):
        t_c = timed(build(iters, False), idx, table)
        t_f = timed(build(iters, True), idx, table)
        c = t_c - t_floor
        f = t_f - t_floor
        overlap = (d + c - f) / min(d, c) if min(d, c) > 0 else 0.0
        print(
            f"iters={iters}: compute net {c*1e3:.2f} ms, fused net "
            f"{f*1e3:.2f} ms, serial-sum {(d+c)*1e3:.2f} ms, "
            f"max() {max(d,c)*1e3:.2f} ms -> overlap recovered "
            f"{overlap*100:.0f}% of min(DMA, compute)"
        )


if __name__ == "__main__":
    main()
