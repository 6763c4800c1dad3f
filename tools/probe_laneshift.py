"""Feasibility probe for the packed-tree SMVP's child-read alignment
(docs/tree_smvp_design.md): a per-lane bounded log-shift gather network
inside a Pallas kernel, for MONOTONE targets (srcA is non-decreasing).

out[j] = in[t(j)], t monotone, 0 <= t(j) - j < 2^BITS.  MSB-first
greedy, riding the absolute source index s:

    round i: take = roll(s, -2^i) <= t;  s/cur = where(take, rolled, .)

After all rounds s == t exactly (monotonicity makes greedy safe).
The tree's typical per-block shift bound is small (#odd buckets in the
child window), so BITS is a size class: probe 5 and 9 rounds.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS = 96
OUT = 256


def shift_gather(data, s, t, bits):
    """data (ROWS, W); s, t (1, W) int32.  Returns aligned data."""
    for i in range(bits - 1, -1, -1):
        sh = 1 << i
        s_r = jnp.roll(s, -sh, axis=1)
        take = s_r <= t
        s = jnp.where(take, s_r, s)
        data = jnp.where(take, jnp.roll(data, -sh, axis=1), data)
    return data


def host_check():
    rng = np.random.default_rng(1)
    w, bits = 512, 8
    # monotone targets with bounded advance
    adv = np.minimum.accumulate((w - 1 - np.arange(w)))
    delta = np.minimum(np.sort(rng.integers(0, 1 << bits, size=w)), adv)
    t = (np.arange(w) + delta).astype(np.int32)
    assert np.all(np.diff(t) >= 0) or True
    t = np.maximum.accumulate(t)  # enforce monotone
    t = np.minimum(t, w - 1)
    data = rng.integers(0, 1 << 13, size=(4, w)).astype(np.uint32)
    got = np.asarray(
        shift_gather(
            jnp.asarray(data),
            jnp.arange(w, dtype=jnp.int32)[None],
            jnp.asarray(t)[None],
            bits,
        )
    )
    want = data[:, t]
    return np.array_equal(got, want)


def make(k_chain, bits, win):
    def kernel(d_ref, t_ref, o_ref):
        data = d_ref[...]
        t = t_ref[...]
        s0 = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
        acc = jnp.zeros((ROWS, OUT), jnp.uint32)
        for _ in range(k_chain):
            g = shift_gather(data, s0, t, bits) if bits else data
            acc = acc + g[:, :OUT] * jnp.uint32(3) + jnp.uint32(1)
            data = data + acc.sum(axis=1, keepdims=True)
        o_ref[...] = acc

    return kernel


def run(nblocks, k_chain, bits, win):
    rng = np.random.default_rng(0)
    d = jnp.asarray(
        rng.integers(0, 1 << 13, size=(ROWS, nblocks * win)).astype(np.uint32)
    )
    base = np.arange(nblocks * win) % win
    delta = rng.integers(0, max(1 << bits, 1), size=nblocks * win)
    t = jnp.asarray(
        np.minimum(base + np.sort(delta.reshape(nblocks, win), axis=1).reshape(-1), win - 1)
        .astype(np.int32)
    )[None]

    f = pl.pallas_call(
        make(k_chain, bits, win),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((ROWS, win), lambda i: (0, i)),
            pl.BlockSpec((1, win), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((ROWS, OUT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ROWS, nblocks * OUT), jnp.uint32),
    )
    g = jax.jit(lambda a, b: f(a, b))
    out = g(d, t)
    np.asarray(out[:1, :1])
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(d, t)
        np.asarray(out[:1, :1])
        best.append(time.perf_counter() - t0)
    return min(best)


def main():
    print(f"host semantics: {'OK' if host_check() else 'MISMATCH'}", flush=True)
    nblocks, k = 2048, 8
    for bits, win in ((0, 512), (5, 512), (9, 1024)):
        t = run(nblocks, k, bits, win)
        print(
            f"bits={bits} win={win}: {t*1e3:7.2f} ms "
            f"({t/(nblocks*k)*1e6:6.2f} us per application)",
            flush=True,
        )


if __name__ == "__main__":
    main()
