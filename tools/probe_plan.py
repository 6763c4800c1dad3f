"""Dispatch-floor-corrected probes for the plan phase (stage 1+2).

Round-1's PERF.md flagged `searchsorted` (512K boundaries in 16M sorted
keys) as a 321 ms item — but that figure carried the ~25 ms dispatch
floor and, worse, was never compared in-program.  This probe times, with
K in-dispatch repetitions:

  - the full sort (16M kv pairs),
  - segment layout via searchsorted / one-hot bincount / scatter-add,
  - the signed decompose (digits) at 2^20 x 16 windows,

so the round-2 plan-phase work targets what is actually slow.

Run:  python tools/probe_plan.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 8


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


def main():
    print(f"backend: {jax.default_backend()}")
    tiny = jnp.ones((8, 128), jnp.uint32)
    floor = timeit(jax.jit(lambda x: x + 1), tiny, n=6)
    print(f"dispatch floor: {floor*1e3:.1f} ms")

    total = 1 << 24  # 16 windows x 2^20 entries
    b = 1 << 19  # bucket lanes

    keys_np = np.sort(
        np.random.RandomState(3).randint(0, b + 1, total).astype(np.int32)
    )
    keys = jnp.asarray(keys_np)
    vals = jnp.arange(total, dtype=jnp.int32)

    # --- sort
    def rep_sort(k, v):
        acc = jnp.zeros((total,), jnp.int32)
        for i in range(K):
            sk, sv = jax.lax.sort((k ^ i, v), dimension=0, num_keys=1)
            acc = acc ^ sk ^ sv
        return acc

    dt = (timeit(jax.jit(rep_sort), keys, vals) - floor) / K
    print(f"sort 16M kv: {dt*1e3:.2f} ms/rep")

    # --- segment layout variants
    bounds_q = jnp.arange(b + 1, dtype=jnp.int32)

    def via_searchsorted(k):
        bounds = jnp.searchsorted(k, bounds_q, side="left").astype(jnp.int32)
        return bounds[:-1] ^ bounds[1:]

    def via_bincount(k):
        cnt = jnp.bincount(k, length=b + 1).astype(jnp.int32)
        return jnp.cumsum(cnt)[:-1]

    def via_scatter(k):
        cnt = jnp.zeros((b + 1,), jnp.int32).at[k].add(1)
        return jnp.cumsum(cnt)[:-1]

    def via_diff(k):
        # segment boundaries from key transitions in the sorted array:
        # starts[j] = first position where k >= j, found by scattering
        # positions at transition points (k[i] != k[i-1])
        pos = jnp.arange(total, dtype=jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), k[:-1]])
        is_first = k != prev
        # scatter first-position into per-key slot; empty keys need a
        # backfill (cummax reversed) — cost of the fix included here
        firsts = (
            jnp.full((b + 2,), total, jnp.int32)
            .at[jnp.where(is_first, k, b + 1)]
            .min(pos)
        )
        rev = jax.lax.cummin(firsts[::-1])[::-1]
        return rev[:b]

    for name, fn in [
        ("searchsorted", via_searchsorted),
        ("bincount", via_bincount),
        ("scatter-add", via_scatter),
        ("transition-scatter", via_diff),
    ]:
        def rep(k, fn=fn):
            acc = jnp.zeros((b,), jnp.int32)
            for i in range(K):
                acc = acc ^ fn(k ^ (i - i))[:b] ^ i
            return acc

        try:
            dt = (timeit(jax.jit(rep), keys) - floor) / K
            print(f"segment layout via {name}: {dt*1e3:.2f} ms/rep")
        except Exception as e:  # noqa: BLE001
            print(f"segment layout via {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
