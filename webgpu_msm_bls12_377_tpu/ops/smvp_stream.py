"""Streamed SMVP (v2): bucket accumulation as a slab-streaming kernel.

The reference's SMVP shader walks each bucket's CSC row serially per
thread (smvp_bls12_377.template.wgsl:70-160); its TPU analogue must feed
one VPU with all buckets in lockstep.  Round 1 did that with per-round
XLA row gathers + masked adds; dispatch-floor-corrected profiling
(tools/probe_stream2.py) showed the true costs on this v5e:

    row gather        ~11 ns/row   (NOT 26 — round-1's figure was
                                    polluted by the ~25 ms dispatch floor)
    element gather    ~8.5 ns/elt
    (rows,128).T      ~free (2.8 TB/s)
    BlockSpec stream  250-370 GB/s
    masked point-add  ~45 ns/lane  (the real bottleneck: ~79% of SMVP)

so the round-1 design's actual waste is its ADD COUNT: static per-window
round classes execute ~2x the masked adds the buckets need.  This module
reorganizes the whole stage around minimizing adds:

1. Per window, buckets are sorted by length (argsort of 2^15 lens —
   trivial), so each 256-lane block has near-uniform bucket lengths; the
   block runs EXACTLY blockmax rounds.  Total adds drop from
   sum_w(256 * global_max_class_w) to sum_blocks(256 * blockmax) —
   ~1.03x the true entry count (measured vs ~2x for round classes).
2. The plan lays every (block, round) out as a consecutive "slab" of 256
   point rows.  One XLA gather materializes all slabs from a SIGNED
   TABLE of 2n+8 rows ([x, y] at idx, [x, -y] at idx+n, an all-zero row
   at 2n) — the digit sign AND the validity mask cost nothing: invalid
   (row, round) pairs gather the zero row, whose mask word is 0, and
   every real row carries mask word 1.  Word layout per 64-word row:
   [x limbs | y limbs | (t limbs) | pad | mask @ 63].
3. A transpose (~free) makes each slab a (64, 256) column block, and the
   Pallas kernel is one grid step per slab: Pallas DMA-pipelines the
   sequential slabs at HBM bandwidth while the VPU does one masked mixed
   add per step into a VMEM-resident block accumulator (output-block
   revisiting across the slabs of a block; scalar-prefetched slab ->
   (input offset, output block, first?) maps).

No manual DMAs, no static round classes, no per-window programs.  The
only host sync is one slab-count readback to pick a static grid size
class (the same sync discipline as the round-1 wmax readback).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import EdwardsOps
from .field import field_neg
from .pallas_kernels import (
    _const_arrays,
    _on_tpu,
    _rebuild_group,
    lazy_add_fn,
    n_const_arrays,
)

LANES = 256  # bucket lanes per block (= columns per slab)
CWP = 64  # words per padded point row; word MASK_WORD carries validity
MASK_WORD = CWP - 1

SIGN_BIT = 30
IDX_MASK = (1 << SIGN_BIT) - 1

# per-slab flag bits (one packed prefetch map; see gather_slabs)
FLAG_FIRST = 1
FLAG_LAST = 2
FLAG_ACT = 4


class StreamLayout(NamedTuple):
    """Device arrays describing the slab layout (plan-program outputs).

    nb_total = num_windows * h / LANES blocks; slabs are blocks' rounds
    laid out consecutively (window-major, rank-major within block).
    """

    starts_rk: jnp.ndarray  # (nb_total, LANES) global segment starts, rank order
    lens_rk: jnp.ndarray  # (nb_total, LANES) segment lengths, rank order
    osl: jnp.ndarray  # (nb_total + 1,) slab offset per block (cumsum of Lb)
    perm: jnp.ndarray  # (num_buckets,) kernel-lane position of bucket j
    total_slabs: jnp.ndarray  # () total slab count (readback -> size class)


def build_stream_layout(
    starts: jnp.ndarray, lens: jnp.ndarray, num_windows: int,
    lanes: int | None = None,
) -> StreamLayout:
    """Length-sorted block/slab layout from the bucket segment arrays.

    starts/lens: (num_buckets,) window-major per-bucket segments into the
    global sorted_vals array (ops/buckets.py:build_bucket_plan).
    lanes: bucket lanes per block — the production 256 by default;
    dryruns/tests shrink it so tiny windows still form whole blocks.
    """
    lanes = LANES if lanes is None else lanes
    num_buckets = starts.shape[0]
    h = num_buckets // num_windows
    assert h % lanes == 0, (h, lanes)
    nb_total = num_buckets // lanes

    lens_w = lens.reshape(num_windows, h)
    # per-window descending length sort; ranks index the kernel lanes.
    # ONE multi-operand lax.sort yields the sorted lens, the rank->slot
    # permutation AND the rank-ordered starts together (argsort +
    # 2x take_along_axis measured ~3x slower as separate ops on v5e).
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_windows, h), 1)
    neg_sorted, order, starts_rk = jax.lax.sort(
        (-lens_w, iota, starts.reshape(num_windows, h)),
        dimension=1,
        num_keys=1,
    )
    lens_rk = -neg_sorted
    # block round counts: max length in each 256-lane block (= first
    # lane's length, since ranks are sorted descending)
    lb = lens_rk.reshape(nb_total, lanes)[:, 0]
    osl = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lb).astype(jnp.int32)]
    )
    # kernel-lane position of bucket (w, j): w*h + rank_w(j).  The inverse
    # of a permutation is its argsort, fused into one 2-operand sort
    # (beats the equivalent 524k-element scatter and a separate argsort).
    _, inv = jax.lax.sort((order, iota), dimension=1, num_keys=1)
    base = (jnp.arange(num_windows, dtype=jnp.int32) * h)[:, None]
    return StreamLayout(
        starts_rk=starts_rk.reshape(nb_total, lanes),
        lens_rk=lens_rk.reshape(nb_total, lanes),
        osl=osl,
        perm=(inv + base).reshape(-1),
        total_slabs=osl[-1],
    )


def slab_class(total_slabs: int, n: int) -> int:
    """Static slab-count size class for a measured total.

    Steps of max(64, n/1024) slabs bound the gather/grid waste at ~1.5%
    of the entry count (was n/256 -> ~6%: measured ~4% of gather+kernel
    time wasted on padding at 2^20).  total_slabs concentrates tightly
    around 1.03x the entry count for random inputs, so in practice one
    class per (n, chunk) still covers every run; a pathological scalar
    distribution just compiles one more class (the engine cache is
    LRU-bounded)."""
    step = max(64, n >> 10)
    return max(step, -(-int(total_slabs) // step) * step)


def build_signed_table(group, table: jnp.ndarray) -> jnp.ndarray:
    """(C, W, N) Montgomery affine coord planes -> (2N + 8, CWP) signed
    gather table.

    Rows [0, N): positive-digit form; rows [N, 2N): negative form (G1:
    -y; Edwards: -x, -t).  Row 2N is all-zero: gathered by every invalid
    (lane, round) pair, its zero MASK_WORD disables the add.  All real
    rows carry MASK_WORD = 1, so one gather yields data + sign + mask.
    """
    c, w, n = table.shape
    if isinstance(group, EdwardsOps):
        neg = jnp.stack(
            [field_neg(group.ctx, table[0]), table[1],
             field_neg(group.ctx, table[2])]
        )
    else:
        neg = jnp.stack([table[0], field_neg(group.ctx, table[1])])
    both = jnp.concatenate([table, neg], axis=2)  # (C, W, 2N)
    rows = both.reshape(c * w, 2 * n).T  # (2N, C*W)
    pad = jnp.zeros((2 * n, CWP - c * w - 1), jnp.uint32)
    mask = jnp.ones((2 * n, 1), jnp.uint32)
    full = jnp.concatenate([rows, pad, mask], axis=1)
    return jnp.concatenate(
        [full, jnp.zeros((8, CWP), jnp.uint32)], axis=0
    )


def _slab_schedule(layout: StreamLayout, s_slabs: int):
    """Shared slab->block schedule: (valid, src, outb, flags).

    valid/src are (s_slabs, LANES): per-lane validity and the global
    segment slot each (slab, lane) consumes.  outb/flags (s_slabs,) are
    the kernel prefetch maps; flags packs three bits per slab — SMEM
    holds ~1 MB total and each 2^20-class map costs 272 KB, so separate
    maps would blow the scoped SMEM budget:

      bit 0 (FLAG_FIRST): block's first slab — init the accumulator;
      bit 1 (FLAG_LAST):  block's final active slab — the kernel
          canonicalizes the lazy-domain accumulator there (cheaper than
          a separate full-bucket-array canon pass);
      bit 2 (FLAG_ACT):   active slab — clear for the static-class tail,
          whose slabs gather only padding, skip all adds, and revisit
          the last block (keeping output revisiting consecutive).
    """
    nb_total = layout.starts_rk.shape[0]
    sl = jnp.arange(s_slabs, dtype=jnp.int32)
    active = sl < layout.total_slabs
    # block id per slab: +1 at each block's first slab, cumsum
    bid = (
        jnp.zeros((s_slabs,), jnp.int32)
        .at[layout.osl[1:]]
        .add(1, mode="drop")
        .cumsum()
    )
    bid = jnp.minimum(bid, nb_total - 1)
    t = sl - jnp.take(layout.osl, bid)
    first = ((t == 0) & active).astype(jnp.int32)
    lastm = (
        (sl == jnp.take(layout.osl, bid + 1) - 1) & active
    ).astype(jnp.int32)
    outb = jnp.where(active, bid, nb_total - 1)
    flags = first | (lastm << 1) | (active.astype(jnp.int32) << 2)

    s_rows = jnp.take(layout.starts_rk, bid, axis=0)  # (s_slabs, LANES)
    l_rows = jnp.take(layout.lens_rk, bid, axis=0)
    valid = active[:, None] & (t[:, None] < l_rows)
    src = s_rows + jnp.minimum(t[:, None], l_rows - 1)
    return valid, src, outb, flags


#: slab ceiling for one stream-kernel invocation: the kernel prefetches
#: two (s_slabs,) int32 maps (outb, flags) into SMEM (~1 MB total), so
#: s_slabs beyond ~110K cannot compile ("Allocation would exceed memory
#: (size=1048576) ... space=smem").  Uniform inputs stay well under it
#: (2^20: ~72K slabs); duplicate-heavy inputs (zipf scalar pools) blow
#: past it (measured 1.07M slabs at 2^20 pool-2^8) — the engine falls
#: back to the pure tree there (log-depth, no slab maps).
SLAB_SMEM_CAP = 110_000

#: piece bound for _take_rows_T; overridable for tests
TRANSPOSE_PIECE_BYTES = 512 << 20


def _take_rows_T(
    table: jnp.ndarray, idx: jnp.ndarray, out_rows: int | None = None
) -> jnp.ndarray:
    """take(table, idx, axis=0).T materialized in bounded pieces.

    The monolithic gather + transpose keeps BOTH layouts live — 2x the
    slab-stream bytes (9.4 GB at Edwards 2^20 chunk-15), the HBM cliff
    behind the reproducible worker crash (PERF.md round 4).  Pieces of
    <= TRANSPOSE_PIECE_BYTES are gathered, transposed and written into
    the output with dynamic_update_slice, which XLA performs in place:
    peak extra memory is one piece (both layouts) instead of a full
    second copy.  out_rows > table.shape[1] zero-pads extra rows.
    """
    m = idx.shape[0]
    cwp = table.shape[1]
    out_rows = cwp if out_rows is None else out_rows
    pieces = max(1, -(-(m * cwp * 4) // TRANSPOSE_PIECE_BYTES))
    if pieces == 1 and out_rows == cwp:
        return jnp.take(table, idx, axis=0).T
    step = _round_up(-(-m // pieces), 1024)  # lane-tile-aligned columns
    out = jnp.zeros((out_rows, m), table.dtype)
    for lo in range(0, m, step):
        g = jnp.take(table, idx[lo : lo + step], axis=0)
        out = jax.lax.dynamic_update_slice(out, g.T, (0, lo))
    return out


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def gather_slabs(
    signed_table: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    layout: StreamLayout,
    s_slabs: int,
):
    """Materialize the slab-stream array + kernel prefetch maps.

    Returns (arr, outb, flags): arr (CWP, s_slabs*LANES) transposed slab
    stream; outb/flags (s_slabs,) prefetch maps (_slab_schedule).
    Invalid (lane, round) pairs gather the signed table's zero row,
    whose zero MASK_WORD disables the add.
    """
    n = (signed_table.shape[0] - 8) // 2
    zero_row = jnp.int32(2 * n)
    valid, src, outb, flags = _slab_schedule(layout, s_slabs)
    sv = jnp.take(sorted_vals, jnp.where(valid, src, 0).reshape(-1))
    idx = sv & IDX_MASK
    neg = 1 - ((sv >> SIGN_BIT) & 1)  # sign_pos==1 -> positive form
    idx2 = jnp.where(valid.reshape(-1), idx + neg * n, zero_row)
    return _take_rows_T(signed_table, idx2), outb, flags


def packed_cwp(n_rows: int) -> int:
    """Padded row count for a packed (projective) slab: coords + a mask
    word, rounded to the 8-sublane tile."""
    return -(-(n_rows + 1) // 8) * 8


def gather_packed_slabs(
    plane: jnp.ndarray,
    layout: StreamLayout,
    s_slabs: int,
):
    """Slab stream over PACKED PROJECTIVE nodes (the tree-hybrid finish).

    plane: (n_coords*W, T) merged lazy-domain node plane (a tree level's
    output, ops/smvp_tree.py); layout: stream layout built over the
    packed per-bucket segments (S_K, c_K).  Returns (arr, outb, flags)
    with arr (CWP2, s_slabs*LANES), CWP2 = packed_cwp(rows): each slab
    column is a node's coords plus a validity word at CWP2-1.  Unlike
    gather_slabs there is no signed-table indirection — the layout's
    segment slots ARE row indices into the plane — and no zero row:
    invalid lanes gather row 0 and are disabled by the mask word.
    """
    rows = plane.shape[0]
    cwp2 = packed_cwp(rows)
    valid, src, outb, flags = _slab_schedule(layout, s_slabs)
    idx = jnp.where(valid, src, 0).reshape(-1)
    arr = _take_rows_T(plane.T, idx, out_rows=cwp2)
    mask = valid.reshape(1, -1).astype(jnp.uint32)
    arr = jax.lax.dynamic_update_slice(arr, mask, (cwp2 - 1, 0))
    return arr, outb, flags


#: body + pallas_call wrapper caches (see pallas_kernels._RUN_CACHE):
#: reusing one wrapper per configuration skips multi-second kernel
#: re-tracing on every size-class build.  ctx excluded from keys
#: (unhashable, per-class unique; constants ride in as inputs).
_BODY_CACHE: dict = {}
_CALL_CACHE: dict = {}


def _stream_kernel_body(group_cls, ctx, n_coords, n_aff, w, lanes=None):
    key = ("stream", group_cls, n_coords, n_aff, w, lanes)
    fn = _BODY_CACHE.get(key)
    if fn is None:
        fn = _stream_kernel_body_build(group_cls, ctx, n_coords, n_aff, w, lanes)
        _BODY_CACHE[key] = fn
    return fn


def _stream_kernel_body_build(group_cls, ctx, n_coords, n_aff, w, lanes=None):
    lanes = LANES if lanes is None else lanes
    n_consts = n_const_arrays(group_cls)
    # paired-product reduction (field.py:mont_mul_pair) where the group
    # has it (G1); MSM_PAIR_REDC=0 pins the unpaired formula for A/B
    # microbenchmarks (set before the first compile of a size class)
    add_name = (
        "add_mixed_lazy_pair"
        if hasattr(group_cls, "add_mixed_lazy_pair")
        and os.environ.get("MSM_PAIR_REDC", "1") != "0"
        else "add_mixed_lazy"
    )

    def kernel(*refs):
        # [outb, flags (prefetch)] [consts..., data] [out]
        flags_ref = refs[1]
        const_vals = [r[...] for r in refs[2 : 2 + n_consts]]
        data_ref = refs[2 + n_consts]
        # ONE (n_coords*W, LANES) output block: coord c at rows [c*w, (c+1)w)
        # — a single merged plane makes the downstream block->window
        # permute ONE row gather instead of n_coords (ops: permute_buckets)
        out_ref = refs[3 + n_consts]

        kgroup = _rebuild_group(group_cls, ctx, const_vals)
        i = pl.program_id(0)
        flags = flags_ref[i]

        def read_acc():
            return tuple(
                out_ref[c * w : (c + 1) * w] for c in range(n_coords)
            )

        def write(vals):
            for c, v in enumerate(vals):
                out_ref[c * w : (c + 1) * w] = v

        @pl.when(flags & FLAG_ACT != 0)
        def _():
            first = flags & FLAG_FIRST
            slab = data_ref[...]  # (CWP, LANES)
            aff = tuple(slab[c * w : (c + 1) * w] for c in range(n_aff))
            m = slab[MASK_WORD : MASK_WORD + 1, :]  # (1, LANES) 0/1

            zero = kgroup.zero((lanes,))
            acc = tuple(
                jnp.where(first == FLAG_FIRST, z, o)
                for z, o in zip(zero, read_acc())
            )
            # lazy-domain add (coords < LAZY_BOUND*p, ops/curve.py):
            # skips every per-op canonical reduction
            new = getattr(kgroup, add_name)(kgroup.Point(*acc), aff)
            write(
                tuple(
                    jnp.where(m, nv, av) for nv, av in zip(new, acc)
                )
            )

        # canonicalize once on each block's last active slab, while the
        # accumulator block is still VMEM-resident (~3% of kernel work
        # vs ~40 ms for a separate pass over the full bucket array)
        @pl.when(flags & FLAG_LAST != 0)
        def _():
            can = kgroup.canon(kgroup.Point(*read_acc()))
            write(tuple(can))

    return kernel


def _packed_kernel_body(group_cls, ctx, n_coords, w, cwp2, lanes=None):
    key = ("packed", group_cls, n_coords, w, cwp2, lanes)
    fn = _BODY_CACHE.get(key)
    if fn is None:
        fn = _packed_kernel_body_build(group_cls, ctx, n_coords, w, cwp2, lanes)
        _BODY_CACHE[key] = fn
    return fn


def _packed_kernel_body_build(group_cls, ctx, n_coords, w, cwp2, lanes=None):
    """Stream-kernel body over packed PROJECTIVE slabs (tree-hybrid
    finish): the addend is a lazy-domain point (add_lazy, closed under
    the 4p bound), not a signed-table affine row.  Flag semantics are
    identical to _stream_kernel_body."""
    lanes = LANES if lanes is None else lanes
    n_consts = n_const_arrays(group_cls)

    def kernel(*refs):
        # [outb, flags (prefetch)] [consts..., data] [out]
        flags_ref = refs[1]
        const_vals = [r[...] for r in refs[2 : 2 + n_consts]]
        data_ref = refs[2 + n_consts]
        out_ref = refs[3 + n_consts]

        kgroup = _rebuild_group(group_cls, ctx, const_vals)
        i = pl.program_id(0)
        flags = flags_ref[i]

        def read_acc():
            return tuple(
                out_ref[c * w : (c + 1) * w] for c in range(n_coords)
            )

        def write(vals):
            for c, v in enumerate(vals):
                out_ref[c * w : (c + 1) * w] = v

        @pl.when(flags & FLAG_ACT != 0)
        def _():
            first = flags & FLAG_FIRST
            slab = data_ref[...]  # (CWP2, LANES)
            node = kgroup.Point(
                *(slab[c * w : (c + 1) * w] for c in range(n_coords))
            )
            m = slab[cwp2 - 1 : cwp2, :]  # (1, LANES) 0/1

            zero = kgroup.zero((lanes,))
            acc = tuple(
                jnp.where(first == FLAG_FIRST, z, o)
                for z, o in zip(zero, read_acc())
            )
            new = lazy_add_fn(kgroup)(kgroup.Point(*acc), node)
            write(
                tuple(
                    jnp.where(m, nv, av) for nv, av in zip(new, acc)
                )
            )

        @pl.when(flags & FLAG_LAST != 0)
        def _():
            can = kgroup.canon(kgroup.Point(*read_acc()))
            write(tuple(can))

    return kernel


def accumulate_packed_streamed(
    group,
    arr: jnp.ndarray,
    outb: jnp.ndarray,
    flags: jnp.ndarray,
    nb_total: int,
    interpret: bool = False,
    lanes: int | None = None,
):
    """Run the packed-projective slab kernel (gather_packed_slabs inputs);
    returns the block-ordered bucket batch, same contract as
    accumulate_buckets_streamed."""
    lanes = LANES if lanes is None else lanes
    ctx = group.ctx
    w = ctx.num_words
    n_coords = len(group.zero((1,)))
    cwp2 = arr.shape[0]
    assert cwp2 == packed_cwp(n_coords * w), (cwp2, n_coords, w)
    consts = _const_arrays(group)
    s_slabs = outb.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_slabs,),
        in_specs=[
            *[
                pl.BlockSpec(
                    (c.shape[0], 1),
                    lambda i, outb, flags: (0, 0),
                    memory_space=pltpu.VMEM,
                )
                for c in consts
            ],
            pl.BlockSpec(
                (cwp2, lanes), lambda i, outb, flags: (0, i)
            ),  # packed slab stream
        ],
        out_specs=pl.BlockSpec(
            (n_coords * w, lanes), lambda i, outb, flags: (0, outb[i])
        ),
    )
    call_key = (
        "packed", type(group), s_slabs, nb_total, lanes, cwp2, interpret
    )
    wrapped = _CALL_CACHE.get(call_key)
    if wrapped is None:
        kernel = _packed_kernel_body(
            type(group), ctx, n_coords, w, cwp2, lanes
        )
        wrapped = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_coords * w, nb_total * lanes), jnp.uint32
            ),
            interpret=interpret,
        )
        _CALL_CACHE[call_key] = wrapped
    return wrapped(
        outb,
        flags,
        *[jnp.asarray(c) for c in consts],
        arr,
    )


def accumulate_buckets_streamed(
    group,
    arr: jnp.ndarray,
    outb: jnp.ndarray,
    flags: jnp.ndarray,
    nb_total: int,
    interpret: bool = False,
    lanes: int | None = None,
):
    """Run the slab-stream kernel; returns the block-ordered bucket batch
    (one lane per bucket, LENGTH-SORTED rank order — apply
    StreamLayout.perm to address bucket (w, j))."""
    lanes = LANES if lanes is None else lanes
    ctx = group.ctx
    w = ctx.num_words
    n_aff = group.AFFINE_COORDS
    n_coords = len(group.zero((1,)))
    consts = _const_arrays(group)
    s_slabs = outb.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # outb, flags (SMEM is ~1 MB: keep maps few)
        grid=(s_slabs,),
        in_specs=[
            *[
                pl.BlockSpec(
                    (c.shape[0], 1),
                    lambda i, outb, flags: (0, 0),
                    memory_space=pltpu.VMEM,
                )
                for c in consts
            ],
            pl.BlockSpec(
                (CWP, lanes), lambda i, outb, flags: (0, i)
            ),  # slab stream
        ],
        # one merged (n_coords*W, LANES) accumulator block per bucket
        # block: coord c at rows [c*W, (c+1)*W)
        out_specs=pl.BlockSpec(
            (n_coords * w, lanes), lambda i, outb, flags: (0, outb[i])
        ),
    )
    call_key = (
        "stream", type(group), s_slabs, nb_total, lanes, interpret
    )
    wrapped = _CALL_CACHE.get(call_key)
    if wrapped is None:
        kernel = _stream_kernel_body(
            type(group), ctx, n_coords, n_aff, w, lanes
        )
        wrapped = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_coords * w, nb_total * lanes), jnp.uint32
            ),
            interpret=interpret,
        )
        _CALL_CACHE[call_key] = wrapped
    out = wrapped(
        outb,
        flags,
        *[jnp.asarray(c) for c in consts],
        arr,
    )
    return out


def permute_buckets(group, blocks, layout: StreamLayout, order=None):
    """Block-ordered kernel output -> window-major bucket batch.

    blocks: the kernel's merged (n_coords*W, nb*LANES) plane
    (accumulate_buckets_streamed).  Row-gather formulation: transpose
    to (B, n_coords*W), take perm rows, transpose back, split coords —
    ONE row gather for all coords (the per-coord and minor-axis forms
    are slower).  Buckets in empty blocks (never visited by the kernel)
    are replaced with the group identity via the per-bucket length mask.

    order: optional static window-major index array (e.g.
    ops/bpr.py:bpr_order): the output is buckets[order.reshape(-1)]
    instead of window-major — composing the BPR walk into THIS gather
    makes the downstream running-sum scan gather-free for no extra cost
    (the composed index is one cheap int take).
    """
    w = group.ctx.num_words
    n_coords = blocks.shape[0] // w
    perm = layout.perm
    if order is not None:
        perm = jnp.take(perm, jnp.asarray(order, jnp.int32).reshape(-1))
    # kernel outputs are canonical: the stream kernel folds the
    # lazy-domain canon into each block's last slab
    sel = jnp.take(blocks.T, perm, axis=0).T  # (n_coords*W, B')
    coords = [sel[c * w : (c + 1) * w] for c in range(n_coords)]
    # empty buckets -> identity (lens in output order)
    lens_sel = jnp.take(layout.lens_rk.reshape(-1), perm)
    nonempty = (lens_sel > 0)[None, :]
    zero = group.zero((1,))
    fixed = [
        jnp.where(nonempty, c, z[:, :1]) for c, z in zip(coords, zero)
    ]
    return group.Point(*fixed)


def stream_supported(
    chunk_size: int, interpret: bool, lanes: int | None = None
) -> bool:
    """The streamed path needs >= ``lanes`` bucket lanes per window and a
    TPU backend (or the interpreter)."""
    lanes = LANES if lanes is None else lanes
    h = 1 << (chunk_size - 1)
    if h % lanes != 0:
        return False
    return interpret or _on_tpu()
