"""TPU probes for the v2 "streamed SMVP" design (ops/smvp_stream.py).

The v2 layout replaces v1's per-lane async DMAs (measured issue-bound at
~0.8 us/DMA -> ~26 ms per window, tools/probe_smvp.py) with an XLA
pre-gather into a length-sorted block-padded round-major layout that a
Pallas kernel can stream with plain BlockSpec pipelining.  Probes, with
the round-1 26 ns/row row-gather figure as the reference point:

  1. pre-gather ns/row at row widths 32/64/128 u32 words — measured:
     width is NOT free above ~256B (39.7 ns at 512B vs 26 ns at 240B);
  2. sorted_vals element gather (S values from a 16M-entry table) — the
     one index gather the padded layout cannot restructure away;
  3. slab-level index construction (per-slab row gathers into rank-
     reordered tables; no per-row element gathers) — replaces a 68
     ns/row naive version;
  4. repack/transpose variants: XLA .T (measured 41 GB/s — too slow),
     vs in-kernel per-slab (256, CW) -> (CW, 256) swapaxes;
  5. the streaming kernel skeleton: static grid, dynamic offsets from
     scalar-prefetch in index_maps, output-block revisiting — verified
     vs an XLA oracle, in both pre-transposed and in-kernel-transpose
     forms.

Run:  python tools/probe_stream.py [--small] [--skip NAME ...]
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


# ---------------------------------------------------------------------------
# streaming kernel skeletons
# ---------------------------------------------------------------------------


def make_stream_kernel(cw, lanes, r_tile, num_out_blocks, grid, transposed):
    """Grid over tiles of r_tile round-slabs.  transposed=True: input is
    (cw, S) and slab r is a (cw, lanes) column block.  transposed=False:
    input is (S, cw) and the kernel swaps axes per slab."""

    def kernel(off_ref, outb_ref, first_ref, data_ref, out_ref):
        i = pl.program_id(0)
        acc = jnp.where(
            first_ref[i] == 1,
            jnp.zeros((cw, lanes), jnp.uint32),
            out_ref[...],
        )
        for r in range(r_tile):  # static round loop
            if transposed:
                slab = data_ref[:, r * lanes : (r + 1) * lanes]
            else:
                slab = jnp.swapaxes(
                    data_ref[r * lanes : (r + 1) * lanes, :], 0, 1
                )
            m = slab[cw - 1 : cw, :]
            acc = acc + slab * m
        out_ref[...] = acc

    if transposed:
        in_spec = pl.BlockSpec(
            (cw, lanes * r_tile), lambda i, off, outb, first: (0, off[i])
        )
    else:
        in_spec = pl.BlockSpec(
            (lanes * r_tile, cw), lambda i, off, outb, first: (off[i], 0)
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
            (cw, num_out_blocks * lanes), jnp.uint32
        ),
    )


def probe_stream_kernel(total_rows, cw=128, lanes=256, r_tile=32,
                        transposed=True):
    rows_per_tile = lanes * r_tile
    grid = total_rows // rows_per_tile
    tiles_per_block = 2
    num_out_blocks = max(1, grid // tiles_per_block)

    tile_off = np.arange(grid, dtype=np.int32)
    tile_out = np.minimum(
        np.arange(grid) // tiles_per_block, num_out_blocks - 1
    ).astype(np.int32)
    tile_first = (np.arange(grid) % tiles_per_block == 0).astype(np.int32)

    def _mkdata():
        if transposed:
            r = jax.lax.broadcasted_iota(jnp.uint32, (cw, total_rows), 0)
            c = jax.lax.broadcasted_iota(jnp.uint32, (cw, total_rows), 1)
            d = (r * 131 + c * 7) & 8191
            mask = ((c * jnp.uint32(2654435761)) >> 24) < 243
            return jnp.where(r == cw - 1, mask.astype(jnp.uint32), d)
        r = jax.lax.broadcasted_iota(jnp.uint32, (total_rows, cw), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (total_rows, cw), 1)
        d = (r * 7 + c * 131) & 8191
        mask = ((r * jnp.uint32(2654435761)) >> 24) < 243
        return jnp.where(c == cw - 1, mask.astype(jnp.uint32), d)

    data = jax.jit(_mkdata)()
    call = make_stream_kernel(
        cw, lanes, r_tile, num_out_blocks, grid, transposed
    )
    run = jax.jit(lambda o, b, f, d: call(o, b, f, d))
    args = (
        jnp.asarray(tile_off),
        jnp.asarray(tile_out),
        jnp.asarray(tile_first),
        data,
    )
    t = timeit(run, *args)
    out = np.asarray(run(*args))

    # oracle on the first 2 output blocks
    span = 2 * tiles_per_block * rows_per_tile
    host = np.asarray(data[:, :span] if transposed else data[:span, :])
    if not transposed:
        host = host.T
    for ob in range(2):
        seg = host[:, ob * tiles_per_block * rows_per_tile : (ob + 1)
                   * tiles_per_block * rows_per_tile]
        rounds = seg.reshape(cw, tiles_per_block * r_tile, lanes)
        m = rounds[cw - 1 : cw]
        want = (rounds * m).sum(axis=1, dtype=np.uint32)
        got = out[:, ob * lanes : (ob + 1) * lanes]
        assert np.array_equal(got, want), (ob, got[:2, :4], want[:2, :4])
    gb = total_rows * cw * 4 / 1e9
    print(
        f"  stream kernel ok ({'pre-T' if transposed else 'in-kernel-T'}, "
        f"r_tile={r_tile}): {t*1e3:.2f} ms for {total_rows/1e6:.1f}M rows "
        f"({grid} tiles) -> {gb/t:.0f} GB/s streamed"
    )
    return t


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")
    scale = 4 if args.small else 0
    n = (1 << 20) >> scale
    rows = int(n * 1.05) & ~8191
    lanes = (1 << 15) >> scale
    total_entries = 16 * n

    # --- probe 1: pre-gather ns/row vs row width
    if "gather" not in args.skip:
        key = jax.random.PRNGKey(1)
        idx = jax.random.randint(key, (rows,), 0, n, dtype=jnp.int32)
        for cw in (32, 64, 128):
            tbl = jax.jit(
                functools.partial(
                    lambda cw: (
                        jax.lax.broadcasted_iota(jnp.uint32, (n, cw), 0) * 131
                    )
                    & 8191,
                    cw,
                )
            )()
            take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            dt = timeit(take, tbl, idx)
            print(
                f"pre-gather {rows/1e6:.1f}M rows x {cw*4}B: {dt*1e3:.1f} ms "
                f"({dt/rows*1e9:.1f} ns/row, {rows*cw*4/dt/1e9:.0f} GB/s)"
            )
            del tbl
        del idx

    # --- probe 2: sorted_vals element gather (S from 16M)
    if "vals" not in args.skip:
        sv = jax.jit(
            lambda: jax.lax.broadcasted_iota(
                jnp.int32, (total_entries, 1), 0
            )[:, 0]
        )()
        src = jax.random.randint(
            jax.random.PRNGKey(5), (rows,), 0, total_entries, jnp.int32
        )
        # monotone variant: windowed src is near-sequential
        src_mono = jnp.sort(src)
        take1 = jax.jit(lambda t, i: jnp.take(t, i))
        for name, ix in (("random", src), ("monotone", src_mono)):
            dt = timeit(take1, sv, ix)
            print(
                f"element gather {rows/1e6:.1f}M from 16M i32 ({name}): "
                f"{dt*1e3:.1f} ms ({dt/rows*1e9:.1f} ns/elt)"
            )
        del sv, src, src_mono

    # --- probe 3: slab-level index construction
    if "index" not in args.skip:
        num_blocks = lanes // 256
        n_slabs = rows // 256
        rng = np.random.RandomState(3)
        lens_np = rng.poisson(n // lanes, lanes).astype(np.int32)
        starts_np = np.zeros(lanes, np.int32)
        starts_np[1:] = np.cumsum(lens_np)[:-1]
        order_np = np.argsort(-lens_np).astype(np.int32)
        lb = lens_np[order_np].reshape(num_blocks, 256).max(axis=1)
        osl_np = np.zeros(num_blocks + 1, np.int32)
        osl_np[1:] = np.cumsum(lb)

        def build_idx(starts, lens, order, osl):
            # slab-level (n_slabs,) arrays
            bid = (
                jnp.zeros((n_slabs,), jnp.int32)
                .at[osl[1:]]
                .add(1)
                .cumsum()
            )
            bid = jnp.minimum(bid, num_blocks - 1)
            t = jnp.arange(n_slabs, dtype=jnp.int32) - jnp.take(osl, bid)
            # rank-reordered per-lane tables, then per-slab ROW gathers
            starts_rk = jnp.take(starts, order).reshape(num_blocks, 256)
            lens_rk = jnp.take(lens, order).reshape(num_blocks, 256)
            s_rows = jnp.take(starts_rk, bid, axis=0)  # (n_slabs, 256)
            l_rows = jnp.take(lens_rk, bid, axis=0)
            valid = t[:, None] < l_rows
            src = s_rows + jnp.minimum(t[:, None], l_rows - 1)
            return jnp.where(valid, src, 0).reshape(-1), valid

        f = jax.jit(build_idx)
        dt = timeit(
            f,
            jnp.asarray(starts_np),
            jnp.asarray(lens_np),
            jnp.asarray(order_np),
            jnp.asarray(osl_np),
        )
        print(
            f"slab-level index construction {rows/1e6:.1f}M rows: "
            f"{dt*1e3:.1f} ms ({dt/rows*1e9:.2f} ns/row)"
        )

    # --- probe 4: repack variants
    if "transpose" not in args.skip:
        big = jax.jit(
            lambda: (
                jax.lax.broadcasted_iota(jnp.uint32, (rows, 128), 0) * 7
            )
            & 8191
        )()
        tr = jax.jit(lambda x: x.T.copy())
        dt = timeit(tr, big)
        print(
            f"XLA transpose {rows/1e6:.1f}M x 128 u32: {dt*1e3:.1f} ms "
            f"({rows*128*4*2/dt/1e9:.0f} GB/s)"
        )
        del big

    # --- probe 5: streaming kernel skeletons
    if "kernel" not in args.skip:
        for cw in (128, 64):
            for transposed in (True, False):
                for r_tile in (32, 8, 1):
                    total_rows = (rows // (256 * max(r_tile, 2) * 2)) * (
                        256 * max(r_tile, 2) * 2
                    )
                    total_rows = (total_rows // (256 * r_tile)) * (
                        256 * r_tile
                    )
                    try:
                        print(f" cw={cw}:")
                        probe_stream_kernel(
                            total_rows, cw=cw, r_tile=r_tile,
                            transposed=transposed,
                        )
                    except Exception as e:  # noqa: BLE001
                        print(
                            f"  stream kernel (cw={cw}, "
                            f"transposed={transposed}, r_tile={r_tile}) "
                            f"FAILED: {type(e).__name__}: {str(e)[:300]}"
                        )


if __name__ == "__main__":
    main()
