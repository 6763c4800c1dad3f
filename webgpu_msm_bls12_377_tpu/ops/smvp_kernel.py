"""Fused segment-DMA SMVP: the whole bucket accumulation in ONE kernel.

Round-1's SMVP (ops/buckets.py:accumulate_buckets) dispatched one gather +
one masked-add kernel per bucket round; the per-row gathers were
latency-bound at ~26 ns/row (~100x below HBM bandwidth) and consumed ~60%
of the whole MSM (PERF.md).  The reference's SMVP shader has no such cost
because it fuses the CSC row walk and the point adds into one dispatch
(smvp_bls12_377.template.wgsl:70-160).  This module is the TPU-native
equivalent, built on one structural observation:

    after the stage-2 sort, each bucket's entries are CONTIGUOUS in
    sorted-entry order.

So instead of per-(round, bucket) random row gathers:

  1. ``pregather_signed`` materializes the sorted point rows ONCE — a
     single jnp.take in sorted_vals order with the digit sign pre-applied
     to the gathered coordinates (so the kernel needs no sign selects).
     This is the only latency-bound gather left: `total` rows instead of
     ``rounds x buckets`` rows (2x fewer at 2^20, >10x at 2^16), and it
     replaces every per-round gather.
  2. ``accumulate_buckets_fused`` runs ONE Pallas program over bucket-lane
     blocks.  Each lane's bucket segment is a contiguous slice of the
     pre-gathered array, so the kernel fetches it with a fixed-size
     per-lane async DMA (a contiguous burst at HBM bandwidth — no row
     gathers), then walks the rounds VMEM-resident: slab extraction, one
     complete mixed add per round, accumulator never leaves VMEM.
  3. Load balance is dynamic: each block loops ``ceil(max bucket length
     in block / R_TILE)`` DMA tiles and exactly ``max length`` rounds —
     per-block trip counts ride in as scalar-prefetch values, so there
     are NO static round classes, NO per-window program variants, and NO
     host sync between plan and main (round-1 read per-window maxima
     back to pick compile classes; here a while-free dynamic fori_loop
     bound replaces them).

The kernel body calls the same jnp group ops as the XLA path
(ops/curve.py), with field constants shipped as (W, 1) inputs exactly as
in ops/pallas_kernels.py, so arithmetic is bit-identical and covered by
the same differential tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import EdwardsOps
from .pallas_kernels import (
    _const_arrays,
    _on_tpu,
    _rebuild_group,
    n_const_arrays,
)

BLOCK = 256  # bucket lanes per kernel program
R_TILE = 32  # rounds staged per DMA tile: (BLOCK, R_TILE, CWP) VMEM scratch
# Padded words per gathered point row (2/3 coords + zero pad).  128, not
# the 64 that would fit the coords: Mosaic requires HBM DMA slices to be
# lane-tile (128) aligned in the minor dim, and a (rows, 64) u32 array is
# physically padded to 128 lanes anyway — so the explicit 128 costs no
# extra HBM bytes or DMA traffic over the padded 64.
CWP = 128

SIGN_BIT = 30
IDX_MASK = (1 << SIGN_BIT) - 1


class SegPlan(NamedTuple):
    """Bucket segment layout for the fused kernel (all device arrays).

    starts/lens are (num_blocks, 1, BLOCK): the unit middle axis makes the
    per-grid-step block shape (1, 1, BLOCK) equal to the array's trailing
    dims, which the Mosaic block-mapping checker requires for non-(8,128)
    blocks.
    """

    starts: jnp.ndarray  # (num_blocks, 1, BLOCK) int32 segment offsets
    lens: jnp.ndarray  # (num_blocks, 1, BLOCK) int32 segment lengths
    rounds: jnp.ndarray  # (num_blocks,) int32 max length per block


def segment_plan(starts: jnp.ndarray, lens: jnp.ndarray) -> SegPlan:
    """Reshape per-bucket segment arrays into per-block kernel inputs."""
    num_buckets = starts.shape[0]
    assert num_buckets % BLOCK == 0, num_buckets
    s2 = starts.reshape(-1, 1, BLOCK)
    l2 = lens.reshape(-1, 1, BLOCK)
    return SegPlan(starts=s2, lens=l2, rounds=l2.max(axis=(1, 2)))


def make_wide_rows(group, table: jnp.ndarray) -> jnp.ndarray:
    """(C, W, N) coord planes -> (N, cw_wide) row-major gather table with
    the negated sign-dependent coords appended.

    table: Montgomery affine coord planes (G1: x,y; Edwards: x,y,t).  The
    negatives are computed ONCE on the (W, N) planes (cheap, batched) and
    selected after the gather, so the one latency-bound row gather fetches
    both variants of the sign-dependent coords in a single wider row (row
    gathers are latency-bound and width-independent up to ~this size;
    PERF.md).  Built once per MSM, shared by every window's pre-gather.
    """
    from .field import field_neg

    c, w, n = table.shape
    if isinstance(group, EdwardsOps):
        # row = [x, y, t, -x, -t]; signed = [x|-x, y, t|-t]
        neg_x = field_neg(group.ctx, table[0])
        neg_t = field_neg(group.ctx, table[2])
        wide = jnp.concatenate([table, neg_x[None], neg_t[None]], axis=0)
    else:
        # row = [x, y, -y]; signed = [x, y|-y]
        neg_y = field_neg(group.ctx, table[1])
        wide = jnp.concatenate([table, neg_y[None]], axis=0)
    cw_wide = wide.shape[0] * w
    return wide.reshape(cw_wide, n).T


def pregather_signed(
    group, rows: jnp.ndarray, sorted_vals: jnp.ndarray
) -> jnp.ndarray:
    """Sorted-order signed point rows: (count + R_TILE, CWP) uint32.

    rows: the make_wide_rows table.  sorted_vals: the (count,) slice of
    the sort output to materialize (one window's entries, or all).

    The output carries R_TILE zero pad rows at the end: the kernel's
    per-lane DMA fetches fixed R_TILE-row tiles, so a segment whose last
    valid row sits near the end of the array still gets a full in-bounds
    tile WITHOUT the clamp shifting its data (any clamped tile is then
    guaranteed to contain no valid round — see accumulate_buckets_fused).
    """
    n, cw_wide = rows.shape
    c = 3 if isinstance(group, EdwardsOps) else 2
    w = cw_wide // (c + (2 if isinstance(group, EdwardsOps) else 1))

    idx = sorted_vals & IDX_MASK
    sign_pos = ((sorted_vals >> SIGN_BIT) == 1)[:, None]  # (count, 1)
    g = jnp.take(rows, idx, axis=0)  # (count, cw_wide)

    count = sorted_vals.shape[0]
    pad = jnp.zeros((count, CWP - c * w), dtype=jnp.uint32)
    if isinstance(group, EdwardsOps):
        x = jnp.where(sign_pos, g[:, :w], g[:, 3 * w : 4 * w])
        t = jnp.where(sign_pos, g[:, 2 * w : 3 * w], g[:, 4 * w : 5 * w])
        out = jnp.concatenate([x, g[:, w : 2 * w], t, pad], axis=1)
    else:
        y = jnp.where(sign_pos, g[:, w : 2 * w], g[:, 2 * w : 3 * w])
        out = jnp.concatenate([g[:, :w], y, pad], axis=1)
    tail = jnp.zeros((R_TILE, CWP), dtype=jnp.uint32)
    return jnp.concatenate([out, tail], axis=0)


def _kernel_body(group_cls, ctx, n_coords, n_aff, w, total, r_tile, block):
    """The Pallas kernel: per-lane segment DMA + in-VMEM bucket rounds."""

    n_consts = n_const_arrays(group_cls)

    def kernel(*refs):
        # [rounds(prefetch)] [starts, lens, consts..., data] [outs] [scratch, sem]
        rounds_ref = refs[0]
        starts_ref, lens_ref = refs[1], refs[2]
        const_vals = [r[...] for r in refs[3 : 3 + n_consts]]
        data_ref = refs[3 + n_consts]
        out_refs = refs[4 + n_consts : 4 + n_consts + n_coords]
        scratch, sem = refs[4 + n_consts + n_coords :]

        kgroup = _rebuild_group(group_cls, ctx, const_vals)
        i = pl.program_id(0)
        nrounds = rounds_ref[i]
        ntiles = jax.lax.div(nrounds + (r_tile - 1), r_tile)
        lens_row = lens_ref[0]  # (1, BLOCK) int32

        acc0 = tuple(kgroup.zero((block,)))

        def tile_body(tt, acc):
            def dma_start(l, _):
                s = starts_ref[0, 0, l] + tt * r_tile
                # in-bounds clamp; only ever moves all-masked tiles (the
                # pregather pad rows make valid tiles unclampable)
                s = jnp.minimum(s, total - r_tile)
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(s, r_tile), :], scratch.at[l], sem
                ).start()
                return 0

            jax.lax.fori_loop(0, block, dma_start, 0)

            def dma_wait(l, _):
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(0, r_tile), :], scratch.at[0], sem
                ).wait()
                return 0

            jax.lax.fori_loop(0, block, dma_wait, 0)

            def round_body(r, acc):
                slab = jnp.swapaxes(scratch[:, r, :], 0, 1)  # (CWP, BLOCK)
                aff = tuple(
                    slab[c * w : (c + 1) * w] for c in range(n_aff)
                )
                t_glob = tt * r_tile + r
                valid = t_glob < lens_row  # (1, BLOCK)
                new = kgroup.add_mixed(kgroup.Point(*acc), aff)
                return tuple(
                    jnp.where(valid, nv, av) for nv, av in zip(new, acc)
                )

            inner = jnp.minimum(nrounds - tt * r_tile, r_tile)
            return jax.lax.fori_loop(0, inner, round_body, acc)

        acc = jax.lax.fori_loop(0, ntiles, tile_body, acc0)
        for o, v in zip(out_refs, acc):
            o[...] = v

    return kernel


def accumulate_buckets_fused(
    group,
    gathered: jnp.ndarray,
    plan: SegPlan,
    interpret: bool = False,
):
    """All bucket rounds in one Pallas program (see module docstring).

    gathered: (total, CWP) signed sorted point rows from
    pregather_signed, whose R_TILE trailing pad rows guarantee that any
    DMA tile containing a valid round is fully in bounds: a valid tile
    starts at most at (last valid row) <= total - R_TILE - 1, so the
    kernel's clamp to total - R_TILE only ever moves tiles whose rounds
    are all masked out by ``lens``.
    Returns the bucket point batch, one lane per bucket, same order/type
    as ops/buckets.py:accumulate_buckets.
    """
    ctx = group.ctx
    w = ctx.num_words
    n_aff = group.AFFINE_COORDS
    total = gathered.shape[0]
    num_blocks, _, block = plan.starts.shape
    n_coords = len(group.zero((1,)))
    consts = _const_arrays(group)
    b = num_blocks * block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # rounds (num_blocks,)
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block), lambda i, rr: (i, 0, 0), memory_space=pltpu.SMEM
            ),  # starts
            pl.BlockSpec(
                (1, 1, block), lambda i, rr: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # lens
            *[
                pl.BlockSpec(
                    (c.shape[0], 1),
                    lambda i, rr: (0, 0),
                    memory_space=pltpu.VMEM,
                )
                for c in consts
            ],
            pl.BlockSpec(memory_space=pl.ANY),  # gathered rows: HBM
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (w, block), lambda i, rr: (0, i), memory_space=pltpu.VMEM
            )
            for _ in range(n_coords)
        ),
        scratch_shapes=[
            pltpu.VMEM((block, R_TILE, CWP), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _kernel_body(
        type(group), ctx, n_coords, n_aff, w, total, R_TILE, block
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((w, b), jnp.uint32) for _ in range(n_coords)
        ),
        interpret=interpret,
    )(
        plan.rounds,
        plan.starts,
        plan.lens,
        *[jnp.asarray(c) for c in consts],
        gathered,
    )
    return group.Point(*out)


def accumulate_buckets_windowed(
    group,
    rows: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    starts: jnp.ndarray,
    lens: jnp.ndarray,
    num_windows: int,
    interpret: bool = False,
):
    """Per-window fused SMVP: one pre-gather + one kernel per window.

    Why not one dispatch over all windows: TPU pads the minor dim of a
    2-D u32 array to 128 lanes, so an all-windows (K*N, CWP=64) pre-gather
    is physically 2x its logical size — 8 GB at 2^20/chunk-16, OOM
    territory once double-buffered.  Per-window buffers are (N, CWP)
    (~512 MB physical at 2^20) and freed as soon as the window's kernel
    consumes them; XLA overlaps window w+1's gather with window w's adds,
    the same dispatch-overlap win measured for the round-1 per-round path
    (PERF.md).

    rows: make_wide_rows table.  starts/lens: per-bucket segment arrays
    over all windows (window-major).  Window w's entries occupy the
    contiguous sorted_vals range [starts[w*h], starts[w*h] + sum(lens_w)]
    and that range always fits in a fixed N-length slice (each window
    contributes at most one entry per point), so every per-window shape
    is static.
    """
    n = rows.shape[0]
    num_buckets = starts.shape[0]
    h = num_buckets // num_windows
    out_coords = None
    for w in range(num_windows):
        base = starts[w * h]
        sv_w = jax.lax.dynamic_slice(sorted_vals, (base,), (n,))
        gathered = pregather_signed(group, rows, sv_w)
        seg = segment_plan(starts[w * h : (w + 1) * h] - base,
                           lens[w * h : (w + 1) * h])
        pts = accumulate_buckets_fused(group, gathered, seg,
                                       interpret=interpret)
        if out_coords is None:
            out_coords = [[c] for c in pts]
        else:
            for acc, c in zip(out_coords, pts):
                acc.append(c)
    return group.Point(
        *(jnp.concatenate(cs, axis=-1) for cs in out_coords)
    )


def windowed_supported(
    num_buckets: int, num_windows: int, n: int, interpret: bool
) -> bool:
    """Per-window fused path preconditions: block-aligned per-window
    lanes, enough entries for the clamped fixed-size DMA, and a TPU
    backend (or the interpreter)."""
    h = num_buckets // num_windows
    if h % BLOCK != 0 or n < R_TILE:
        return False
    return interpret or _on_tpu()


def fused_supported(num_buckets: int, total: int, interpret: bool) -> bool:
    """Single-dispatch fused path preconditions: block-aligned lanes,
    enough entries for the clamped fixed-size DMA, and a TPU backend (or
    the interpreter).  Memory note: the all-windows pre-gather is
    physically ~2x K*N*CWP*4 bytes (lane padding) — fine below ~2^19
    points, prefer the windowed path above (see
    accumulate_buckets_windowed)."""
    if num_buckets % BLOCK != 0 or total < R_TILE:
        return False
    return interpret or _on_tpu()
