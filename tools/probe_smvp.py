"""TPU probes for the round-2 fused SMVP kernel design.

Measures, on the real device, the primitives the segment-DMA SMVP kernel
(ops/smvp_kernel.py) depends on, before committing to the design:

  1. pre-gather: jnp.take of `total` rows from the point table, row widths
     60 (natural) vs 64 (256-byte aligned) — is the one-time sorted-order
     gather cheaper with aligned rows?
  2. plan phase: searchsorted vs scatter-add bincount+cumsum for the
     bucket segment layout (the 321 ms item in PERF.md).
  3. the Pallas kernel skeleton: per-lane async DMA of contiguous
     segments (dynamic SMEM-scalar offsets), dynamic fori_loop trip
     counts from a prefetched per-block array, per-round slab extraction
     at a dynamic middle-axis index, and an in-kernel (BLOCK, CW) ->
     (CW, BLOCK) uint32 transpose.  Verified against an XLA oracle.

Run:  python tools/probe_smvp.py [--small]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    # slice ONE element on device before converting: np.asarray of the full
    # array would drag gigabytes through the ~60 MB/s tunnel (and the relay
    # raises ResourceExhausted on multi-GB transfers)
    leaf = jax.tree_util.tree_leaves(x)[0]
    # slice every dim (ravel would materialize a full-size 1-D copy)
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def timeit(fn, *args, n=3):
    # fence+free every iteration: TPU pads the minor dim to 128 lanes, so
    # a (2^24, 60) u32 output is physically 8 GB — holding the previous
    # run's output while the next computes OOMs a 16 GB chip
    out = fn(*args)  # compile + warm
    fence(out)
    del out
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        fence(out)
        del out
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------------------
# probe 3: the kernel skeleton
# ---------------------------------------------------------------------------


def make_probe_kernel(total, cw, block, r_tile, num_blocks):
    def kernel(trips_ref, starts_ref, lens_ref, data_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        ntiles = trips_ref[i]
        lens_row = lens_ref[0]  # (1, BLOCK) int32

        def tile_body(tt, acc):
            def dma_start(l, _):
                s = starts_ref[0, 0, l] + tt * r_tile
                s = jnp.minimum(s, total - r_tile)
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(s, r_tile), :],
                    scratch.at[l],
                    sem,
                ).start()
                return 0

            jax.lax.fori_loop(0, block, dma_start, 0)

            def dma_wait(l, _):
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(0, r_tile), :],
                    scratch.at[0],
                    sem,
                ).wait()
                return 0

            jax.lax.fori_loop(0, block, dma_wait, 0)

            def round_body(r, acc):
                slab = scratch[:, r, :]  # (BLOCK, CW), dynamic middle index
                slab_t = jnp.swapaxes(slab, 0, 1)  # (CW, BLOCK)
                t_glob = tt * r_tile + r
                valid = (t_glob < lens_row).astype(jnp.uint32)  # (1, BLOCK)
                return acc + slab_t * valid

            return jax.lax.fori_loop(0, r_tile, round_body, acc)

        acc0 = jnp.zeros((cw, block), dtype=jnp.uint32)
        out_ref[...] = jax.lax.fori_loop(0, ntiles, tile_body, acc0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # trips (num_blocks,)
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block), lambda i, tr: (i, 0, 0), memory_space=pltpu.SMEM
            ),  # starts (num_blocks, 1, BLOCK)
            pl.BlockSpec(
                (1, 1, block), lambda i, tr: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # lens (num_blocks, 1, BLOCK)
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (cw, block), lambda i, tr: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block, r_tile, cw), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cw, num_blocks * block), jnp.uint32),
    )


def probe_kernel(total, cw, b, block, r_tile, lens_np, interpret=False):
    num_blocks = b // block
    starts_np = np.zeros(b, dtype=np.int32)
    starts_np[1:] = np.cumsum(lens_np)[:-1].astype(np.int32)
    max_per_block = lens_np.reshape(num_blocks, block).max(axis=1)
    trips_np = np.maximum(1, -(-max_per_block // r_tile)).astype(np.int32)

    # deterministic device-generated data in ONE buffer (randint+astype
    # holds two full-size copies transiently -> OOM at the 8 GB scale)
    def _mkdata():
        r = jax.lax.broadcasted_iota(jnp.uint32, (total, cw), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (total, cw), 1)
        return (r * 131 + c * 7) & 8191

    data = jax.jit(_mkdata)()
    starts2 = jnp.asarray(starts_np.reshape(num_blocks, 1, block))
    lens2 = jnp.asarray(lens_np.reshape(num_blocks, 1, block).astype(np.int32))
    trips = jnp.asarray(trips_np)

    call = make_probe_kernel(total, cw, block, r_tile, num_blocks)
    run = jax.jit(lambda t, s, l, d: call(t, s, l, d))

    t = timeit(run, trips, starts2, lens2, data)
    out = np.asarray(run(trips, starts2, lens2, data))

    # XLA oracle on a slice of lanes (pull only each lane's segment: the
    # full data array is gigabytes and the host tunnel is ~60 MB/s)
    check_lanes = list(range(0, b, max(1, b // 97)))[:64]
    for l in check_lanes:
        s, ln = int(starts_np[l]), int(lens_np[l])
        want = np.asarray(data[s : s + ln]).sum(axis=0, dtype=np.uint32)
        got = out[:, l]
        assert np.array_equal(got, want), (l, got[:4], want[:4])
    rows = int(lens_np.sum())
    print(
        f"  kernel ok: {t*1e3:.2f} ms for {rows/1e6:.1f}M useful rows "
        f"({b} lanes, mean len {lens_np.mean():.1f}, "
        f"{trips_np.sum()} block-tiles) -> {rows*cw*4/t/1e9:.0f} GB/s useful"
    )
    return t


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--kernel-only", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}")
    scale = 4 if args.small else 0
    total = (1 << 24) >> scale  # entries (2^20 MSM, 16 windows)
    b = (1 << 19) >> scale  # bucket lanes
    n = (1 << 20) >> scale

    if args.kernel_only:
        _probe_kernel_skeleton(total, b)
        return

    # --- probe 1: pre-gather row width
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (total,), 0, n, dtype=jnp.int32)
    for cw in (60, 64):
        tbl = jax.random.randint(
            jax.random.PRNGKey(2), (n, cw), 0, 1 << 13, jnp.int32
        ).astype(jnp.uint32)
        take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(take, tbl, idx)
        print(
            f"pre-gather {total/1e6:.0f}M rows of {cw} words: {dt*1e3:.1f} ms"
            f" ({dt/total*1e9:.1f} ns/row)"
        )

    # --- probe 2: segment layout (starts/lens) from sorted keys
    keys = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(3), (total,), 0, b, jnp.int32)
    )

    def via_searchsorted(k):
        bounds = jnp.searchsorted(
            k, jnp.arange(b + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return bounds[:-1], bounds[1:] - bounds[:-1]

    def via_bincount(k):
        cnt = jnp.bincount(k, length=b).astype(jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1].astype(jnp.int32)]
        )
        return starts, cnt

    def via_scatter(k):
        cnt = jnp.zeros((b,), jnp.int32).at[k].add(1)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1]]
        )
        return starts, cnt

    s0, l0 = jax.jit(via_searchsorted)(keys)
    for name, fn in [
        ("searchsorted", via_searchsorted),
        ("bincount", via_bincount),
        ("scatter-add", via_scatter),
    ]:
        try:
            f = jax.jit(fn)
            s1, l1 = f(keys)
            ok = bool(
                jnp.array_equal(s0, s1) & jnp.array_equal(l0, l1)
            )
            dt = timeit(f, keys)
            print(f"segment layout via {name}: {dt*1e3:.1f} ms ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"segment layout via {name}: FAILED {type(e).__name__} {e}")

    # --- probe 3: kernel skeleton at PER-WINDOW scale (the production
    # dispatch unit: total=n entries, b=2^(c-1) lanes, mean len n/b),
    # uniform then poisson lens
    del keys, s0, l0, tbl, idx
    _probe_kernel_skeleton(total, b)


def _probe_kernel_skeleton(total, b):
    w_total, w_b = total // 16, b // 16  # 2^20 entries, 2^15 lanes
    rng = np.random.RandomState(7)
    mean = w_total // w_b
    for kind in ("uniform", "poisson"):
        if kind == "uniform":
            lens_np = np.full(w_b, mean, np.int64)
        else:
            lens_np = rng.poisson(mean, w_b)
            # rescale to sum <= total
            while lens_np.sum() > w_total:
                lens_np = np.minimum(lens_np, lens_np.max() - 1)
        print(f"kernel probe ({kind} lens, mean {lens_np.mean():.1f}):")
        try:
            # cw=128: Mosaic requires lane-aligned (128) HBM DMA slices
            probe_kernel(w_total + 32, 128, w_b, 256, 32, lens_np)
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"  kernel probe FAILED: {type(e).__name__}")
            break


if __name__ == "__main__":
    main()
