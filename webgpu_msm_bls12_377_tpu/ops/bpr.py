"""Stage 4 — parallel running-sum bucket reduction (cuZK Algorithm 4).

TPU-native equivalent of the reference's two-entry-point BPR shader
(src/submission/implementation/wgsl/cuzk/bpr.template.wgsl:69-173) and its
CPU models parallel_bucket_reduction_1/2 (bpr.ts:72-126):

- stage 1: every (window, thread) lane walks its block of buckets from the
  top down, keeping the running sums m (bucket total) and g (weighted
  total).  All windows * num_threads lanes advance in lockstep, one
  bucket gather + two point-adds per step, bpt-1 steps (a lax.fori_loop).
- stage 2: g += m * s with the static per-lane scalar
  s = bpt * (num_threads - thread - 1), computed by a vectorized
  double-and-add whose bit masks are compile-time constants
  (bpr.template.wgsl double_and_add:42, stage_2:125-173).
- window reduction: the reference reads 16*256 g-points back and sums on
  the CPU (submission.ts:294-308); here a log2(T)-step on-device tree add
  folds the thread lanes so only num_windows points leave the chip.

The reference splits BPR into two dispatches for an Apple-GPU driver bug
(README.md:267); under XLA it is simply one fused program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_kernels import (
    fused_add_lazy,
    fused_double_lazy,
    fused_running_add_lazy,
    masked_add_and_double_lazy,
)


def bpr_order(
    num_windows: int, chunk_size: int, num_threads: int
) -> np.ndarray:
    """Static (bpt, lanes) window-major bucket index per (step, lane).

    Row 0 is each lane's m/g seed (idx0 below), row st >= 1 the bucket its
    running sums consume at step st — exactly the gather sequence of
    reduce_buckets' stage 1, laid out so the whole walk becomes ONE row
    gather (composable with the stream path's block->window permutation)
    and the scan consumes contiguous slices instead of issuing a
    minor-axis bucket gather per step.
    """
    h = 1 << (chunk_size - 1)
    tc = min(num_threads, h)
    assert tc >= 1 and tc & (tc - 1) == 0, (
        f"num_threads must be a power of two (got {num_threads}): a "
        f"non-dividing thread count would silently drop bucket slots"
    )
    bpt = h // tc
    wi = np.repeat(np.arange(num_windows, dtype=np.int32), tc)
    tf = np.tile(np.arange(tc, dtype=np.int32), num_windows)
    base = wi * h + (tc - tf) * bpt
    idx0 = np.where(tf == 0, wi * h, base)
    return np.stack([idx0] + [base - st for st in range(1, bpt)])


def reduce_buckets_prearranged(
    group,
    buckets_bpr,
    num_windows: int,
    chunk_size: int,
    num_threads: int = 256,
):
    """reduce_buckets on a batch pre-gathered in bpr_order.

    buckets_bpr: point batch with bpt*lanes columns laid out step-major
    (column st*lanes + lane = buckets[bpr_order[st, lane]]).  The stream
    pipeline composes bpr_order with its own block->window permutation so
    the rearrangement costs nothing extra (ops/smvp_stream.py
    permute_buckets); stage 1 then runs gather-free, two fused adds per
    step in one Pallas call (fused_running_add).
    """
    h = 1 << (chunk_size - 1)
    t_count = min(num_threads, h)
    bpt = h // t_count
    lanes = num_windows * t_count

    def col_slice(pb, st):
        return type(pb)(*(c[:, st * lanes : (st + 1) * lanes] for c in pb))

    m = col_slice(buckets_bpr, 0)
    g = m
    if bpt > 1:
        # scan over contiguous step slices: (w, bpt*lanes) -> (bpt, w, lanes)
        w = buckets_bpr[0].shape[0]
        xs = type(buckets_bpr)(
            *(
                jnp.moveaxis(
                    c[:, lanes:].reshape(w, bpt - 1, lanes), 1, 0
                )
                for c in buckets_bpr
            )
        )

        def body(mg, bi):
            m, g = mg
            m, g = fused_running_add_lazy(group, m, g, bi)
            return (m, g), None

        (m, g), _ = jax.lax.scan(body, (m, g), xs)

    return _bpr_stage2_and_fold(
        group, m, g, num_windows, t_count, bpt
    )


def _bpr_stage2_and_fold(group, m, g, num_windows, t_count, bpt):
    """Stage 2 (g += m * s) + per-window tree fold, shared by both paths."""
    # one lane-layout scaffold for stage 2 AND the fold below
    wi = np.repeat(np.arange(num_windows, dtype=np.int32), t_count)
    tf = np.tile(np.arange(t_count, dtype=np.int32), num_windows)
    # s = k << b with k = t_count-1-tf, b = log2(bpt): every lane's low
    # b bits are ZERO, so the plain double-and-add over s (the
    # reference's form, bpr.template.wgsl:42) spends b masked-add steps
    # on provably-dead bits.  On SIMD lanes a masked add executes
    # whether or not the bit is set — which is also why Booth/wNAF
    # recodings (the reference's scalar_mul.template.wgsl experiments)
    # buy nothing here: sparser digits don't skip work, only FEWER
    # STEPS do (PERF.md round-5 A/B).  Factoring the shift replaces
    # those b steps with b pure doubles of the addend.
    b_shift = max(bpt.bit_length() - 1, 0)
    k_lane = (t_count - 1 - tf).astype(np.int64)
    nbits = max(int(k_lane.max()).bit_length(), 1)
    bit_table = jnp.asarray(
        np.stack([(k_lane >> b) & 1 for b in range(nbits)]).astype(bool)
    )  # (nbits, lanes) compile-time constant

    temp = m
    for _ in range(b_shift):
        temp = fused_double_lazy(group, temp)

    def bit_body(rt, bits_row):
        result, temp = rt
        result, temp = masked_add_and_double_lazy(group, result, temp, bits_row)
        return (result, temp), None

    (g, _), _ = jax.lax.scan(bit_body, (g, temp), bit_table)

    # --- fold thread lanes per window: log2(T) shift-reduce adds at a
    # FIXED (w, lanes) shape.  A halving tree would instantiate a
    # distinct Mosaic kernel per level (5+ remote compiles per size
    # class); the shift form reuses ONE fused_add shape for every level
    # at a negligible extra-lane cost (~2 ms).  Lane i reads partner
    # i+off, which is in-window for every lane that still influences
    # lane 0 (i < off <= T/2 => i+off < T); dead lanes read a clamped
    # partner and compute garbage that never flows into lane 0.
    off = t_count // 2
    while off >= 1:
        partner = wi * t_count + np.minimum(tf + off, t_count - 1)
        shifted = type(g)(
            *(jnp.take(c, jnp.asarray(partner), axis=1) for c in g)
        )
        g = fused_add_lazy(group, g, shifted)
        off //= 2
    # lane 0 of each window holds the fold
    lane0 = jnp.asarray(
        np.arange(num_windows, dtype=np.int32) * t_count
    )
    picked = type(g)(*(jnp.take(c, lane0, axis=1) for c in g))
    # the whole reduction ran in the lazy domain (inputs are canonical
    # buckets, every step closed under < LAZY_BOUND*p); one canon on the
    # num_windows surviving lanes restores the canonical output contract
    return group.canon(picked)


def reduce_buckets(
    group,
    buckets,
    num_windows: int,
    chunk_size: int,
    num_threads: int = 256,
):
    """Window sums from the (window-major, slot) bucket point batch.

    buckets: point batch with num_windows * 2^(chunk_size-1) lanes.
    Returns a point batch with num_windows lanes (window j's bucket-weighted
    sum, i.e. the reference's per-subtask reduced point).
    """
    h = 1 << (chunk_size - 1)
    t_count = min(num_threads, h)
    assert t_count >= 1 and t_count & (t_count - 1) == 0, (
        f"num_threads must be a power of two (got {num_threads})"
    )
    bpt = h // t_count

    wi = np.repeat(np.arange(num_windows, dtype=np.int32), t_count)
    tf = np.tile(np.arange(t_count, dtype=np.int32), num_windows)
    base = jnp.asarray(wi * h + (t_count - tf) * bpt)  # one past block top
    idx0 = jnp.asarray(
        np.where(tf == 0, wi * h, wi * h + (t_count - tf) * bpt)
    )

    def gather(point_batch, idx):
        return type(point_batch)(
            *(jnp.take(c, idx, axis=1) for c in point_batch)
        )

    # --- stage 1: per-lane running sums (bpr.template.wgsl stage_1:69-121)
    # lax.scan, not fori_loop/while_loop: nesting the Montgomery scans
    # under a while_loop is a ~100x XLA/TPU compile pathology (ops/buckets.py)
    m0 = gather(buckets, idx0)
    g0 = m0

    def body(mg, i):
        m, g = mg
        bi = gather(buckets, base - 1 - i)
        m = fused_add_lazy(group, m, bi)
        g = fused_add_lazy(group, g, m)
        return (m, g), None

    (m, g), _ = jax.lax.scan(
        body, (m0, g0), jnp.arange(bpt - 1, dtype=jnp.int32)
    )

    # --- stage 2 (g += m * s, s static per lane, stage_2:125-173) + fold
    return _bpr_stage2_and_fold(group, m, g, num_windows, t_count, bpt)
