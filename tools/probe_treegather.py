"""Probe: the packed-tree SMVP's in-kernel child gather (round-5 build).

Two questions, on the real TPU:

1. Semantics — does jnp.take_along_axis(axis=1) on a (R, 128) slice with
   a (1, 128) index row lower in Mosaic and return the right values
   (single-source-vreg contract, tools/probe_laneshift.py findings)?
2. Cost — the full window-gather network (WIN/128 slices x 2 halves,
   gather+select each) for child A and child B reads over R coord rows,
   at level-1-like block counts, vs a passthrough kernel (pure IO) and
   vs a dummy-compute kernel approximating one lazy point add.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 256


def window_gather(W, idx, out_lanes=LANES):
    """out[:, j] = W[:, idx[0, j]] for idx values in [0, W.shape[1]).

    Static slice-select network: output processed in 128-lane halves,
    each gathered from every 128-aligned slice of W via a single-vreg
    take_along_axis, then selected by the slice id.
    """
    r, win = W.shape
    n_slices = win // 128
    halves = []
    for h in range(out_lanes // 128):
        ih = idx[:, h * 128 : (h + 1) * 128]  # (1, 128)
        sid = ih >> 7
        loc = ih & 127
        loc_b = jnp.broadcast_to(loc, (r, 128))
        acc = jnp.zeros((r, 128), jnp.uint32)
        for s in range(n_slices):
            sl = W[:, s * 128 : (s + 1) * 128]
            g = jnp.take_along_axis(sl, loc_b, axis=1)
            acc = jnp.where(sid == s, g, acc)
        halves.append(acc)
    return jnp.concatenate(halves, axis=1)


def make_kernel(mode, rows, win):
    def kernel(w0, w1, w2, loc_ref, o_ref):
        W = jnp.concatenate([w0[...], w1[...], w2[...]], axis=1)
        loc = loc_ref[...]
        if mode == "pass":
            o_ref[...] = W[:, :LANES] + loc.astype(jnp.uint32)
        elif mode == "gatherA":
            o_ref[...] = window_gather(W, loc)
        elif mode == "gatherAB":
            a = window_gather(W, loc)
            b = window_gather(W, loc + 1)
            o_ref[...] = a + b
        elif mode == "addlike":
            # ~ one lazy mixed add worth of VPU work: ~11 muls x ~13x13
            # u32 mul rows ~ 1900 int ops; approximate with 24 rounds of
            # mul+add over the (rows, 256) block
            a = W[:, :LANES]
            acc = a
            for _ in range(240):
                acc = acc * jnp.uint32(1664525) + jnp.uint32(1013904223)
            o_ref[...] = acc
        elif mode == "gatherAB+addlike":
            a = window_gather(W, loc)
            b = window_gather(W, loc + 1)
            acc = a + b
            for _ in range(240):
                acc = acc * jnp.uint32(1664525) + jnp.uint32(1013904223)
            o_ref[...] = acc

    return kernel


def run(mode, nblocks, rows, win=768, check=False):
    rng = np.random.default_rng(0)
    T_in = nblocks * LANES + win
    d = jnp.asarray(rng.integers(0, 1 << 30, size=(rows, T_in)).astype(np.uint32))
    # monotone-ish child indices with small drift, like the tree's loc maps
    base = 2 * (np.arange(nblocks * LANES) % LANES)
    drift = np.sort(rng.integers(0, 32, size=(nblocks, LANES)), axis=1).reshape(-1)
    loc = np.minimum(base + drift, win - 2).astype(np.int32)
    loc_j = jnp.asarray(loc).reshape(1, -1)

    tile = lambda k: pl.BlockSpec((rows, 256), lambda i: (0, i + k))
    f = pl.pallas_call(
        make_kernel(mode, rows, win),
        grid=(nblocks,),
        in_specs=[
            tile(0), tile(1), tile(2),
            pl.BlockSpec((1, LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, nblocks * LANES), jnp.uint32),
    )
    g = jax.jit(lambda a, b: f(a, a, a, b))
    out = g(d, loc_j)
    np.asarray(out[:1, :1])
    if check:
        dd = np.asarray(d)
        want = np.empty((rows, nblocks * LANES), np.uint32)
        for i in range(nblocks):
            w = dd[:, i * 256 : i * 256 + win]
            l = loc[i * LANES : (i + 1) * LANES]
            if mode == "gatherA":
                want[:, i * 256 : (i + 1) * 256] = w[:, l]
            elif mode == "gatherAB":
                want[:, i * 256 : (i + 1) * 256] = w[:, l] + w[:, l + 1]
        ok = np.array_equal(np.asarray(out), want)
        print(f"  {mode}: semantics {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            bad = np.argwhere(np.asarray(out) != want)
            print("  first bad:", bad[:4], flush=True)
        return
    best = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = g(d, loc_j)
        np.asarray(out[:1, :1])
        best.append(time.perf_counter() - t0)
    t = min(best)
    print(
        f"  {mode:18s} rows={rows}: {t*1e3:7.2f} ms "
        f"({t/nblocks*1e6:6.2f} us/block)",
        flush=True,
    )


def main():
    print("semantics check (small):", flush=True)
    run("gatherA", 64, 8, check=True)
    run("gatherAB", 64, 8, check=True)
    print("cost at level-1-like scale (33800 blocks ~ 8.65M nodes):", flush=True)
    nb = 33800
    for rows in (32, 40):
        run("pass", nb, rows)
        run("gatherA", nb, rows)
        run("gatherAB", nb, rows)
    print("cost with add-like compute (levels >= 2, 39 rows):", flush=True)
    run("addlike", nb, 39)
    run("gatherAB+addlike", nb, 39)


if __name__ == "__main__":
    main()
