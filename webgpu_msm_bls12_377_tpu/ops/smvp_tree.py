"""Packed segmented-tree SMVP (v3): bucket sums with NO entry permutation.

The slab stream (ops/smvp_stream.py) pays one 17M-element gather to
permute the sorted entry stream into slab order — measured 180 ms at
2^20, the machine's permutation floor (every 17M-element reorder
primitive costs 75-180 ms on this v5e).  This module replaces stage 3
with a reduction tree over the *sorted* order, which never permutes:

  level 1 pairs adjacent same-bucket entries of the sorted stream
  (read near-sequentially, both-affine adds), and every later level
  pairs adjacent nodes of the previous level's packed output.  After
  L = ceil(log2(max bucket length)) levels each bucket's sum sits at
  its packed offset; ONE small row gather (num_buckets rows, composed
  with the BPR walk order) assembles the bucket array.

Packed layout.  Level k stores bucket b's c_k[b] = ceil(c_{k-1}[b]/2)
nodes at S_k[b] = exclusive-cumsum(c_k); c_0 = bucket lengths.  Node
p's children sit at childA(p) = 2p + off(p), childA + 1, where
off(p) = S_{k-1}[b(p)] - 2 S_k[b(p)] is constant per bucket — a
per-slot map built by one boundary delta-scatter + cumsum (B-sized
scatter, T-sized cumsum; no large gathers anywhere in the plan).

Child reads.  childA is monotone with bounded in-block span: off is
non-increasing across buckets (it drops by 1 per odd bucket), so a
256-node output block's children span <= 767 slots — three
consecutive 256-lane tiles of the previous level, selected per block
by a prefetched tile-base map.  In-kernel alignment uses the Mosaic
single-vreg dynamic gather (jnp.take_along_axis over 128-lane slices
+ slice-id selects — tools/probe_treegather.py: the full network costs
~6 ms per 8.6M nodes, noise next to the adds).  Level 1 additionally
crosses the per-window invalid-entry gaps of the sorted layout, so its
window tile count is a (rarely > 3) size class from a one-int span
readback.

Work.  Total adds = sum of entries - nonempty buckets, the information
floor (the slab stream runs ~1.03x entries); HALF of them are level
1's both-affine adds (9M vs the stream's 11M mixed).  Tail levels are
mostly single-child copies, bounded by #buckets per level.

Reference: this stage replaces the serial per-bucket CSC walk of
smvp_bls12_377.template.wgsl:70-160 (via the sort/segment plan of
ops/buckets.py).
"""

from __future__ import annotations

import functools
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
from . import smvp_stream
from .smvp_stream import (
    StreamLayout,
    accumulate_packed_streamed,
    build_stream_layout,
    gather_packed_slabs,
)

BLOCK = 256  # output nodes per kernel step
SIGN_BIT = 30
IDX_MASK = (1 << SIGN_BIT) - 1

FLAG_SINGLE = 1 << 14  # node has one child: copy/promote, no add
FLAG_INVALID = 1 << 15  # class-padding slot: write the identity
LOC_MASK = FLAG_SINGLE - 1


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def level0_class(kn: int, w1_tiles: int = 3) -> int:
    """Static padded size of the level-0 (sorted entry) stream.

    Strictly > kn so the last childB read stays inside the array, >= 768
    so a 3-tile window always exists, plus the level-1 window overhang
    (windows picked for 3 tiles may extend w1_tiles - 3 further)."""
    return max(_round_up(kn + 1, BLOCK), 768) + BLOCK * (w1_tiles - 3)


def level_classes(kn: int, num_buckets: int, levels: int) -> list[int]:
    """Static packed sizes for levels 1..levels.

    T_k <= (T_{k-1} + #nonempty buckets)/2; the class keeps one strict
    slot of slack (so child reads never touch the class boundary), a
    768 floor (so 3-tile windows exist), and 3 tiles of tail padding so
    the next level's m clamp (build_level_map: m <= prev_tiles - 3)
    never clips a real block's window start — without the pad, real
    children reaching into the last 2 tiles of a tight class would
    shift base past the 3-tile window (the same failure mode as the
    round-4 level-1 wrong-result bug, one padding decision away)."""
    out = []
    prev = max(_round_up(kn + 1, BLOCK), 768)
    for _ in range(levels):
        prev = max(
            768, _round_up((prev + num_buckets) // 2 + 1, BLOCK) + 3 * BLOCK
        )
        out.append(prev)
    return out


def num_levels(max_len: int) -> int:
    """Levels until every bucket is a single node: ceil(log2(maxlen)),
    size-classed by the caller via the maxlen readback."""
    return max(1, int(np.ceil(np.log2(max(int(max_len), 2)))))


#: hard cap on the level-1 window tile class: the plan clips each slot's
#: window-local child index to BLOCK*MAX_W1_TILES - 2 (it cannot know the
#: final tile class — that IS the readback), so a span needing more tiles
#: than this would silently corrupt reads; the engine asserts against it.
#: 8 tiles cover base+2 <= 2048 (observed level-1 need at 2^20: 778).
MAX_W1_TILES = 8


def w1_tiles_for(span1: int) -> int:
    """Level-1 window tile class from the plan's need readback.

    span1 is max(valid window-local child index) + 2 — measured directly
    on the plan's clipped-m base values, so it accounts for both the
    bucket-boundary offset jumps AND the end-of-array m clamp (the
    round-4 wrong-result bug: the old in-block child-span formula said 4
    tiles while the plan had clipped base at the 3-tile bound)."""
    return max(3, -(-int(span1) // BLOCK))


def tree_supported(interpret: bool) -> bool:
    return interpret or _on_tpu()


class TreePlan(NamedTuple):
    """Plan-program outputs for the tree SMVP (device arrays)."""

    loc1: jnp.ndarray  # (T1cls,) level-1 per-slot child map
    m1: jnp.ndarray  # (T1cls/256,) level-1 window tile base
    lens: jnp.ndarray  # (B,) bucket lengths (level >= 2 maps, final mask)
    stats: jnp.ndarray  # (2,) [max bucket length, max level-1 block span]


def build_tree_table(group, table: jnp.ndarray) -> jnp.ndarray:
    """(C, W, N) Montgomery affine planes -> (2N + 8, R) signed row table.

    Rows [0, N): positive-digit form; [N, 2N): negative (G1: -y;
    Edwards: -x, -t); row 2N is the all-zero padding row.  R pads the
    C*W coord words to a multiple of 8 (sublane tiling); unlike the slab
    table (smvp_stream.build_signed_table) there is NO mask word — tree
    validity lives in the loc maps — so G1 rows are 128 B, not 256 B.
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
    r = _round_up(c * w, 8)
    if r > c * w:
        rows = jnp.concatenate(
            [rows, jnp.zeros((2 * n, r - c * w), jnp.uint32)], axis=1
        )
    return jnp.concatenate([rows, jnp.zeros((8, r), jnp.uint32)], axis=0)


def build_level_map(
    s_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    s_k: jnp.ndarray,
    c_k: jnp.ndarray,
    t_cls: int,
    prev_tiles: int,
    wtiles: int,
):
    """Per-slot child map for one tree level (all scatter/cumsum, no
    large gathers).

    Returns (loc, m, span): loc (t_cls,) packs the window-local childA
    index with FLAG_SINGLE/FLAG_INVALID; m (t_cls/BLOCK,) is the input
    window's first tile per output block; span is max(valid base) + 2 —
    the exact per-slot window REQUIREMENT (childB = base+1 exclusive),
    including both bucket-boundary offset jumps and the end-of-array m
    clamp.  The caller sizes the kernel's tile window from this readback
    (level 1) or relies on the invariant base + 2 <= BLOCK * wtiles
    (levels >= 2: off is non-increasing so in-block child spread <= 510,
    and level_classes pads every class by 3 tiles so the m clamp never
    fires — base[0] <= 255, base + 2 <= 767 < 768).
    """
    t_k = s_k[-1] + c_k[-1]  # real node count (dynamic)
    off = s_prev - 2 * s_k  # (B,) constant per bucket
    delta = jnp.concatenate([off[:1], off[1:] - off[:-1]])
    plane = (
        jnp.zeros((t_cls,), jnp.int32).at[s_k].add(delta, mode="drop")
    )
    offplane = jnp.cumsum(plane)
    iota = jnp.arange(t_cls, dtype=jnp.int32)
    child_a = 2 * iota + offplane
    cb = child_a.reshape(-1, BLOCK)
    m = jnp.clip(cb[:, 0] >> 8, 0, prev_tiles - wtiles)
    base = cb - (m << 8)[:, None]
    valid = (iota < t_k).reshape(-1, BLOCK)
    # span measures the UNCLIPPED requirement: if a distribution ever
    # needed more than MAX_W1_TILES tiles, w1_tiles_for(span) must
    # exceed the cap so the engine assert fires instead of the clip
    # below silently corrupting reads
    span = jnp.max(jnp.where(valid, base, 0)) + 2
    # the clip bound must NOT depend on the final tile class (unknown
    # here — the span readback above picks it): clip at the hard cap
    base = jnp.clip(base, 0, BLOCK * MAX_W1_TILES - 2)
    singles = (
        jnp.zeros((t_cls,), jnp.int32)
        .at[jnp.where((c_prev & 1) == 1, s_k + c_k - 1, t_cls)]
        .add(FLAG_SINGLE, mode="drop")
    )
    loc = jnp.where(
        valid.reshape(-1), base.reshape(-1) + singles, FLAG_INVALID
    )
    return loc, m, span


def extend_with_phantom(
    starts: jnp.ndarray, lens: jnp.ndarray, kn: int, num_windows: int
):
    """Append one PHANTOM bucket per window covering the window's
    skipped sentinel tail (zero digits sort past every real bucket and
    are excluded from lens).

    Without it, the tail makes `starts` jump at the window boundary
    while the packed cumsum does not, so the level map's offset
    off = s_prev - 2*s_k jumps by the tail size — unbounded by any
    static tile window (duplicate-heavy zipf inputs concentrate zero
    digits in one window: a 6,827-entry tail at 2^20 pool-2^8 needed a
    31-tile window and silently corrupted the clipped reads).  With the
    phantom, every consecutive-bucket delta is lens[b] - 2*ceil(lens[b]/2)
    in {-1, 0} INCLUDING window boundaries, so off is non-increasing and
    3 tiles always suffice, for any input distribution.  Phantom nodes
    pack real (sentinel-entry) points whose sums land in phantom slots
    that no layout, permute, or later consumer ever references.
    """
    num_buckets = lens.shape[0]
    h = num_buckets // num_windows
    n_row = kn // num_windows
    s2 = starts.reshape(num_windows, h)
    l2 = lens.reshape(num_windows, h)
    row_end = (
        (jnp.arange(num_windows, dtype=starts.dtype) + 1) * n_row
    )
    tail_start = s2[:, -1] + l2[:, -1]
    tail_len = row_end - tail_start
    starts_e = jnp.concatenate([s2, tail_start[:, None]], axis=1).reshape(-1)
    lens_e = jnp.concatenate([l2, tail_len[:, None]], axis=1).reshape(-1)
    return starts_e, lens_e


def real_bucket_view(arr_e: jnp.ndarray, num_windows: int) -> jnp.ndarray:
    """(num_windows*(h+1),) extended per-bucket array -> (num_windows*h,)
    real buckets (drops the per-window phantom slot)."""
    he = arr_e.shape[0] // num_windows
    return arr_e.reshape(num_windows, he)[:, : he - 1].reshape(-1)


def build_tree_plan(
    starts: jnp.ndarray, lens: jnp.ndarray, kn: int, num_windows: int
) -> TreePlan:
    """Level-1 maps + the two size-class scalars, from the bucket plan.

    Built in the plan program because the [maxlen, span] readback picks
    the main program's static (levels, window) classes; levels >= 2 maps
    are rebuilt cheaply inside the main program (B-sized cumsums).
    plan.lens is the PHANTOM-EXTENDED per-bucket array (see
    extend_with_phantom); maxlen in stats covers real buckets only."""
    starts_e, lens_e = extend_with_phantom(starts, lens, kn, num_windows)
    c1 = (lens_e + 1) >> 1
    s1 = jnp.cumsum(c1) - c1
    t1_cls = level_classes(kn, lens_e.shape[0], 1)[0]
    t0_tiles = level0_class(kn) // BLOCK
    loc1, m1, span1 = build_level_map(
        starts_e, lens_e, s1, c1, t1_cls, t0_tiles, 3
    )
    stats = jnp.stack([jnp.max(lens), span1]).astype(jnp.int32)
    return TreePlan(loc1=loc1, m1=m1, lens=lens_e, stats=stats)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def window_gather(W, idx):
    """out[:, j] = W[:, idx[0, j]] via single-vreg dynamic gathers.

    W (R, win); idx (1, BLOCK) int32 in [0, win).  Each 128-lane output
    half gathers from every 128-aligned slice of W with one
    take_along_axis (sources within one vreg by construction) and a
    slice-id select — tools/probe_treegather.py for semantics + cost.
    """
    r, win = W.shape
    halves = []
    for h in range(BLOCK // 128):
        ih = idx[:, h * 128 : (h + 1) * 128]
        sid = ih >> 7
        loc_b = jnp.broadcast_to(ih & 127, (r, 128))
        acc = jnp.zeros((r, 128), W.dtype)
        for s in range(win // 128):
            g = jnp.take_along_axis(
                W[:, s * 128 : (s + 1) * 128], loc_b, axis=1
            )
            acc = jnp.where(sid == s, g, acc)
        halves.append(acc)
    return jnp.concatenate(halves, axis=1)


#: kernel bodies and pallas_call wrappers cached by configuration (ctx
#: excluded: it is unhashable and per-class unique — constants ride in
#: as inputs).  Reusing one wrapper object across levels/classes lets
#: pallas skip re-tracing the multi-second 30-limb kernel body
#: (see pallas_kernels._RUN_CACHE for the measurement).
_BODY_CACHE: dict = {}
_LEVEL_CALL_CACHE: dict = {}


def _tree_kernel_body(group_cls, ctx, mode, wtiles, last, w, n_coords, n_aff):
    key = (group_cls, mode, wtiles, last, w, n_coords, n_aff)
    fn = _BODY_CACHE.get(key)
    if fn is None:
        fn = _tree_kernel_body_build(
            group_cls, ctx, mode, wtiles, last, w, n_coords, n_aff
        )
        _BODY_CACHE[key] = fn
    return fn


def _tree_kernel_body_build(
    group_cls, ctx, mode, wtiles, last, w, n_coords, n_aff
):
    """One tree level as a Pallas kernel.

    mode "aff": inputs are signed-table affine rows (level 1) — add is
    the both-affine lazy form, single-child promotes to projective.
    mode "full": inputs are packed lazy points — full lazy add,
    single-child copies.  last=True canonicalizes outputs (the tree's
    one canon, at the smallest level).
    """
    n_consts = n_const_arrays(group_cls)
    pair = (
        mode == "aff"
        and hasattr(group_cls, "add_affine_lazy_pair")
        and os.environ.get("MSM_PAIR_REDC", "1") != "0"
    )

    def kernel(*refs):
        # [m (prefetch)] [consts...] [loc] [tile_0..tile_{wtiles-1}] [out]
        const_vals = [r[...] for r in refs[1 : 1 + n_consts]]
        loc = refs[1 + n_consts][...]  # (1, BLOCK) int32
        tiles = refs[2 + n_consts : 2 + n_consts + wtiles]
        out_ref = refs[2 + n_consts + wtiles]
        kgroup = _rebuild_group(group_cls, ctx, const_vals)

        W = jnp.concatenate([t[...] for t in tiles], axis=1)
        invalid = (loc & FLAG_INVALID) != 0
        single = (loc & FLAG_SINGLE) != 0
        ia = loc & LOC_MASK
        if mode == "aff":
            W = W[: n_aff * w]
        a_rows = window_gather(W, ia)
        b_rows = window_gather(W, ia + 1)
        if mode == "aff":
            aff_a = tuple(a_rows[c * w : (c + 1) * w] for c in range(n_aff))
            aff_b = tuple(b_rows[c * w : (c + 1) * w] for c in range(n_aff))
            res = (
                kgroup.add_affine_lazy_pair(aff_a, aff_b)
                if pair
                else kgroup.add_affine_lazy(aff_a, aff_b)
            )
            alt = kgroup.from_affine(aff_a)
        else:
            pa = kgroup.Point(
                *(a_rows[c * w : (c + 1) * w] for c in range(n_coords))
            )
            pb = kgroup.Point(
                *(b_rows[c * w : (c + 1) * w] for c in range(n_coords))
            )
            res = lazy_add_fn(kgroup)(pa, pb)
            alt = pa
        zero = kgroup.zero((BLOCK,))
        sel = kgroup.Point(
            *(
                jnp.where(invalid, z, jnp.where(single, av, rv))
                for z, av, rv in zip(zero, alt, res)
            )
        )
        if last:
            sel = kgroup.canon(sel)
        for c, v in enumerate(sel):
            out_ref[c * w : (c + 1) * w] = v

    return kernel


def run_tree_level(
    group,
    arr_in: jnp.ndarray,
    loc: jnp.ndarray,
    m: jnp.ndarray,
    t_cls: int,
    mode: str,
    wtiles: int,
    last: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one level kernel: arr_in (rows_in, prev_cls) -> merged
    (n_coords*W, t_cls) packed node planes."""
    ctx = group.ctx
    w = ctx.num_words
    n_aff = group.AFFINE_COORDS
    n_coords = len(group.zero((1,)))
    consts = _const_arrays(group)
    rows_in = arr_in.shape[0]

    call_key = (
        type(group), mode, wtiles, last, rows_in, t_cls, interpret
    )
    wrapped = _LEVEL_CALL_CACHE.get(call_key)
    if wrapped is None:

        def tile_spec(k):
            return pl.BlockSpec(
                (rows_in, BLOCK), lambda i, m, _k=k: (0, m[i] + _k)
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t_cls // BLOCK,),
            in_specs=[
                *[
                    pl.BlockSpec(
                        (c.shape[0], 1),
                        lambda i, m: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for c in consts
                ],
                pl.BlockSpec((1, BLOCK), lambda i, m: (0, i)),
                *[tile_spec(k) for k in range(wtiles)],
            ],
            out_specs=pl.BlockSpec(
                (n_coords * w, BLOCK), lambda i, m: (0, i)
            ),
        )
        kernel = _tree_kernel_body(
            type(group), ctx, mode, wtiles, last, w, n_coords, n_aff
        )
        wrapped = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_coords * w, t_cls), jnp.uint32
            ),
            interpret=interpret,
        )
        _LEVEL_CALL_CACHE[call_key] = wrapped
    return wrapped(
        m,
        *[jnp.asarray(c) for c in consts],
        loc.reshape(1, -1),
        *([arr_in] * wtiles),
    )


# ---------------------------------------------------------------------------
# Stage driver
# ---------------------------------------------------------------------------


def gather_level0(
    tree_table: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    w1_tiles: int,
) -> jnp.ndarray:
    """Signed-table rows in SORTED ENTRY ORDER: (R, T0cls).

    The indices are an elementwise transform of sorted_vals — this is
    the point-row gather the slab path also pays, WITHOUT the 17M-element
    slab-order permutation that precedes it there."""
    kn = sorted_vals.shape[0]
    n = (tree_table.shape[0] - 8) // 2
    t0 = level0_class(kn, w1_tiles)
    idx = sorted_vals & IDX_MASK
    neg = 1 - ((sorted_vals >> SIGN_BIT) & 1)
    idx2 = idx + neg * n
    pad = jnp.full((t0 - kn,), 2 * n, jnp.int32)
    idx2 = jnp.concatenate([idx2, pad])
    return jnp.take(tree_table, idx2, axis=0).T


def tree_smvp(
    group,
    tree_table: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    plan: TreePlan,
    levels: int,
    w1_tiles: int,
    interpret: bool = False,
):
    """Full tree reduction: returns (final, s_fin) where final is the
    (n_coords*W, T_Lcls) canonical packed plane and s_fin (B,) the
    packed offset of each bucket's sum (valid where lens > 0)."""
    kn = sorted_vals.shape[0]
    num_buckets = plan.lens.shape[0]
    t_cls = level_classes(kn, num_buckets, levels)
    arr0 = gather_level0(tree_table, sorted_vals, w1_tiles)
    lvl = run_tree_level(
        group, arr0, plan.loc1, plan.m1, t_cls[0], "aff", w1_tiles,
        last=(levels == 1), interpret=interpret,
    )
    c_prev = (plan.lens + 1) >> 1
    s_prev = jnp.cumsum(c_prev) - c_prev
    for k in range(2, levels + 1):
        c_k = (c_prev + 1) >> 1
        s_k = jnp.cumsum(c_k) - c_k
        loc, m, _span = build_level_map(
            s_prev, c_prev, s_k, c_k, t_cls[k - 1],
            t_cls[k - 2] // BLOCK, 3,
        )
        lvl = run_tree_level(
            group, lvl, loc, m, t_cls[k - 1], "full", 3,
            last=(k == levels), interpret=interpret,
        )
        c_prev, s_prev = c_k, s_k
    return lvl, s_prev


# ---------------------------------------------------------------------------
# Hybrid finish: tree levels 1..K, then the length-sorted stream kernel
# over the packed level-K plane
# ---------------------------------------------------------------------------
#
# The pure tree's tail levels are IO-bound copies: packed level sizes
# floor at the bucket count, so levels 5..8 at 2^20 move ~360 B/node for
# ~0.5M mostly-single-child nodes each (probe_tree_stages: ~130 ms of
# 2^20 runtime including their maps).  The finish replaces every level
# past K with ONE pass of the proven slab-stream machinery
# (ops/smvp_stream.py) applied to the packed level-K nodes: the
# length-sorted block layout runs ~1.03x the true remaining adds, and
# the permutation it needs is a T_K-row gather (T_2 ~ 4.6M at 2^20 —
# 4x fewer rows than the level-0 stream path pays, and the 17M-element
# sorted_vals permute the tree exists to kill stays dead).


class HybridPlan(NamedTuple):
    """Plan-program outputs for the hybrid tree+finish SMVP."""

    loc1: jnp.ndarray  # (T1cls,) level-1 per-slot child map
    m1: jnp.ndarray  # (T1cls/256,) level-1 window tile base
    lens: jnp.ndarray  # (B,) bucket lengths (level >= 2 maps)
    layout: StreamLayout  # finish-stage layout over (S_K, c_K)
    stats: jnp.ndarray  # (3,) [maxlen, level-1 span, total_slabs]


def chain_counts(lens: jnp.ndarray, k_levels: int):
    """Per-bucket packed node counts/offsets after k pairwise levels."""
    c = lens
    s = None
    for _ in range(k_levels):
        c = (c + 1) >> 1
        s = jnp.cumsum(c) - c
    return c, s


def build_hybrid_plan(
    starts: jnp.ndarray,
    lens: jnp.ndarray,
    kn: int,
    k_levels: int,
    num_windows: int,
    lanes: int,
) -> HybridPlan:
    """Level-1 maps + the finish-stage stream layout + 3 class scalars.

    plan.lens is phantom-extended (extend_with_phantom); the finish
    layout covers REAL buckets only — phantom packed slots are never
    gathered by the stream finish."""
    starts_e, lens_e = extend_with_phantom(starts, lens, kn, num_windows)
    c1 = (lens_e + 1) >> 1
    s1 = jnp.cumsum(c1) - c1
    t1_cls = level_classes(kn, lens_e.shape[0], 1)[0]
    t0_tiles = level0_class(kn) // BLOCK
    loc1, m1, span1 = build_level_map(
        starts_e, lens_e, s1, c1, t1_cls, t0_tiles, 3
    )
    c_k, s_k = chain_counts(lens_e, k_levels)
    layout = build_stream_layout(
        real_bucket_view(s_k, num_windows),
        real_bucket_view(c_k, num_windows),
        num_windows,
        lanes,
    )
    stats = jnp.stack(
        [jnp.max(lens), span1, layout.total_slabs]
    ).astype(jnp.int32)
    return HybridPlan(
        loc1=loc1, m1=m1, lens=lens_e, layout=layout, stats=stats
    )


def tree_smvp_hybrid(
    group,
    tree_table: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    plan: HybridPlan,
    k_levels: int,
    w1_tiles: int,
    s_slabs: int,
    interpret: bool = False,
    lanes: int | None = None,
):
    """Tree levels 1..k_levels, then the packed stream finish.

    Returns the block-ordered bucket batch (one lane per bucket,
    length-sorted rank order — address via plan.layout, e.g.
    smvp_stream.permute_buckets)."""
    lanes = smvp_stream.LANES if lanes is None else lanes
    kn = sorted_vals.shape[0]
    num_buckets = plan.lens.shape[0]
    t_cls = level_classes(kn, num_buckets, k_levels)
    arr0 = gather_level0(tree_table, sorted_vals, w1_tiles)
    lvl = run_tree_level(
        group, arr0, plan.loc1, plan.m1, t_cls[0], "aff", w1_tiles,
        last=False, interpret=interpret,
    )
    c_prev = (plan.lens + 1) >> 1
    s_prev = jnp.cumsum(c_prev) - c_prev
    for k in range(2, k_levels + 1):
        c_k = (c_prev + 1) >> 1
        s_k = jnp.cumsum(c_k) - c_k
        loc, m, _span = build_level_map(
            s_prev, c_prev, s_k, c_k, t_cls[k - 1],
            t_cls[k - 2] // BLOCK, 3,
        )
        lvl = run_tree_level(
            group, lvl, loc, m, t_cls[k - 1], "full", 3,
            last=False, interpret=interpret,
        )
        c_prev, s_prev = c_k, s_k
    arr, outb, flags = gather_packed_slabs(lvl, plan.layout, s_slabs)
    # bucket blocks in the finish = REAL buckets / lanes (plan.lens and
    # the packed planes are phantom-extended; the layout is real-only)
    nb_total = plan.layout.starts_rk.shape[0]
    return accumulate_packed_streamed(
        group, arr, outb, flags, nb_total,
        interpret=interpret, lanes=lanes,
    )


def permute_tree(group, final, s_fin, lens, order=None):
    """Packed tree output -> window-major (or order-composed) bucket
    batch; empty buckets become the group identity.  The analogue of
    smvp_stream.permute_buckets — one small row gather of B rows."""
    w = group.ctx.num_words
    n_coords = final.shape[0] // w
    idx = jnp.where(lens > 0, s_fin, 0)
    mask = lens > 0
    if order is not None:
        o = jnp.asarray(order, jnp.int32).reshape(-1)
        idx = jnp.take(idx, o)
        mask = jnp.take(mask, o)
    sel = jnp.take(final.T, idx, axis=0).T  # (n_coords*W, B')
    coords = [sel[c * w : (c + 1) * w] for c in range(n_coords)]
    zero = group.zero((1,))
    fixed = [
        jnp.where(mask[None, :], c, z[:, :1]) for c, z in zip(coords, zero)
    ]
    return group.Point(*fixed)
