"""Probe the packed-tree SMVP plan primitives at 2^20 scale.

The tree eliminates the 180 ms sorted_vals permutation (all levels
sequential) IF the per-level packed-layout maps are cheap.  Candidates
for the per-position bucket offset map:

  a. delta scatter (B ids) into T_k zeros + cumsum  (per level)
  b. one concatenated scatter (L*B deltas) + one cumsum over sum(T_k)
  c. jnp.repeat(values, counts, total_repeat_length)
  d. cummax variant of (a)

Also: the strided slice cost (level array -> next level reads).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    B = 524288  # buckets at 2^20 chunk-16
    kn = 16 << 20
    rng = np.random.default_rng(0)

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones((8, 128), jnp.uint32), n=6)
    print(f"floor={floor*1e3:.2f} ms", flush=True)

    # level-1 size ~ kn/2
    t1 = kn // 2
    idx = jax.device_put(jnp.asarray(np.sort(rng.integers(0, t1, size=B)).astype(np.int32)))
    vals = jax.device_put(jnp.asarray(rng.integers(-100, 100, size=B).astype(np.int32)))

    def scat_cumsum(i, v, size):
        z = jnp.zeros((size,), jnp.int32).at[i].add(v, mode="drop")
        return jnp.cumsum(z)

    for size, tag in ((t1, "T1=8.3M"), (kn // 4, "T2=4.2M"), (B, "T=B")):
        f = jax.jit(lambda i, v, s=size: scat_cumsum(i, v, s))
        t = timeit(f, jnp.minimum(idx, size - 1), vals)
        print(f"a. scatter(B)+cumsum {tag:9s}: {t*1e3:7.1f} ms", flush=True)

    # (b) concatenated: 7 levels, 7B deltas, cumsum over ~17.8M
    tot = int(kn * 1.07)
    bigidx = jax.device_put(
        jnp.asarray(np.sort(rng.integers(0, tot, size=7 * B)).astype(np.int32))
    )
    bigvals = jax.device_put(jnp.asarray(rng.integers(-100, 100, size=7 * B).astype(np.int32)))
    f = jax.jit(lambda i, v: scat_cumsum(i, v, tot))
    t = timeit(f, bigidx, bigvals)
    print(f"b. scatter(7B)+cumsum 17.8M: {t*1e3:7.1f} ms", flush=True)

    # (c) repeat with total_repeat_length
    counts = rng.multinomial(t1, np.ones(B) / B).astype(np.int32)
    counts_d = jax.device_put(jnp.asarray(counts))
    pv = jax.device_put(jnp.asarray(rng.integers(0, 1 << 20, size=B).astype(np.int32)))
    f = jax.jit(lambda v, c: jnp.repeat(v, c, total_repeat_length=t1))
    t = timeit(f, pv, counts_d)
    print(f"c. repeat B->8.3M          : {t*1e3:7.1f} ms", flush=True)

    # (e) plain cumsum over 17.8M (isolate)
    z = jax.device_put(jnp.asarray(rng.integers(0, 3, size=tot).astype(np.int32)))
    t = timeit(jax.jit(jnp.cumsum), z)
    print(f"e. cumsum 17.8M            : {t*1e3:7.1f} ms", flush=True)

    # (f) elementwise pass + compare over 16.7M (level mask costs)
    a = jax.device_put(jnp.asarray(rng.integers(0, 1 << 20, size=kn).astype(np.int32)))
    t = timeit(jax.jit(lambda a: (a[: kn // 2] == a[kn // 2 :]).astype(jnp.int32)), a)
    print(f"f. 8.3M compare            : {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
