"""Multi-chip MSM: shard points over a device mesh, combine per-window sums.

The reference is single-device; its README lists multi-device MSM as future
work (README.md:553).  The TPU-native scaling design (BASELINE.json north
star, SURVEY.md §2.7):

- points and scalars are sharded over a 1-D mesh axis ("points"): every
  chip runs the full cuZK pipeline — decompose, sort-transpose, bucket
  accumulation, running-sum reduction — on its local shard with zero
  communication (bucket accumulation is chip-local by construction).
- only the per-window partial sums leave the chip: num_windows projective
  points, a few KB.  They are combined with one all_gather over ICI and a
  log-depth on-device point-add tree, so the result is replicated.  Group
  addition is not a psum-able monoid, which is why the reduction is
  all_gather + explicit tree rather than an XLA all-reduce — and why
  reducing *after* BPR (4096 points -> num_windows points per chip) cuts
  ICI volume by ~2^15 vs all-reducing bucket partials (SURVEY.md §7).
- the tiny Horner fold across windows stays on the host, as in the
  reference (submission.ts:310-318).

Scaling model: per-chip work is n/D point-adds for accumulation plus an
O(buckets) BPR term independent of n; communication is O(D * num_windows)
points.  Efficiency at 2^20 over 16 chips is therefore dominated by the
fixed BPR term — the bench measures it directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.cuzk import (
    CuzkMsmEngine,
    choose_chunk_size,
    mont_point_table,
    num_windows_for,
)
from ..ops.smvp_tree import (
    MAX_W1_TILES,
    HybridPlan,
    TreePlan,
    build_hybrid_plan,
    build_tree_plan,
    build_tree_table,
    num_levels,
    permute_tree,
    real_bucket_view,
    tree_smvp,
    tree_smvp_hybrid,
    w1_tiles_for,
)
from ..ops.bpr import bpr_order, reduce_buckets, reduce_buckets_prearranged
from ..ops.pallas_kernels import fused_add_lazy
from ..ops.buckets import (
    BucketPlan,
    accumulate_buckets,
    build_bucket_plan,
    round_class,
    table_to_rows,
    window_slice_indices,
)
from ..ops.decompose import decompose_scalars_signed
from ..ops.field import from_mont
from ..ops import smvp_stream
from ..ops.smvp_stream import (
    SLAB_SMEM_CAP,
    StreamLayout,
    accumulate_buckets_streamed,
    build_signed_table,
    build_stream_layout,
    gather_slabs,
    permute_buckets,
    slab_class,
)


AXIS = "points"


def make_mesh(devices=None) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=(AXIS,))


class ShardedMsmEngine(CuzkMsmEngine):
    """CuzkMsmEngine that shards the point/scalar axis over a mesh.

    compute_msm() keeps the reference's single-call API; inputs are padded
    to a multiple of the mesh size with zero scalars (zero digits map to
    the skipped bucket sentinel, so padding contributes nothing).
    """

    def __init__(self, curve, mesh: Mesh | None = None, **kw):
        super().__init__(curve, **kw)
        self.mesh = mesh if mesh is not None else make_mesh()

    def _build_sharded_plan_fn(self, chunk_size: int):
        ctx = self.ctx
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, AXIS), P(None, AXIS)),
            out_specs=(
                P(AXIS, None),  # table rows: (n, C*W) sharded on points
                P(AXIS),  # sorted_vals: per-chip slabs
                P(AXIS, None),  # starts: (D, num_buckets)
                P(AXIS, None),  # lens: (D, num_buckets)
                P(None),  # wmax: (num_windows,) global maxima, replicated
            ),
            check_vma=False,
        )
        def plan_fn(point_words, scalar_words):
            table = mont_point_table(ctx, group, point_words)
            digits = decompose_scalars_signed(
                scalar_words, chunk_size, num_windows
            )
            plan = build_bucket_plan(digits, chunk_size)
            # per-window global max on device: the only plan->main host
            # sync is num_windows ints, REPLICATED over the mesh (a pmax
            # over ICI/DCN) so multi-host processes can all read it —
            # never the full lens array
            wmax = plan.lens.reshape(num_windows, -1).max(axis=1)
            wmax = jax.lax.pmax(wmax, AXIS)
            return (
                table_to_rows(table),
                plan.sorted_vals,
                plan.starts[None],
                plan.lens[None],
                wmax,
            )

        return plan_fn

    def _build_sharded_main_fn(
        self, chunk_size: int, num_rounds: int, windows: tuple[int, ...]
    ):
        ctx = self.ctx
        group = self.group
        mesh = self.mesh
        bpr_threads = self.num_bpr_threads
        n_dev = mesh.devices.size
        h = 1 << (chunk_size - 1)
        idx_const = window_slice_indices(windows, h)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(AXIS, None),
                P(AXIS),
                P(AXIS, None),
                P(AXIS, None),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def main_fn(table_rows, sorted_vals, starts, lens):
            plan = BucketPlan(
                sorted_vals=sorted_vals,
                starts=jnp.take(starts[0], idx_const),
                lens=jnp.take(lens[0], idx_const),
            )
            buckets = accumulate_buckets(group, table_rows, plan, num_rounds)
            wsums = reduce_buckets(
                group, buckets, len(windows), chunk_size, bpr_threads
            )
            stacked = jnp.stack(list(wsums))  # (C, W, len(windows))
            # per-window partial sums ride ICI once; group addition is not
            # psum-able, so: all_gather + on-device add tree
            gathered = jax.lax.all_gather(stacked, AXIS)  # (D, C, W, g)
            acc = type(wsums)(*(gathered[0, c] for c in range(len(wsums))))
            for d in range(1, n_dev):
                other = type(wsums)(
                    *(gathered[d, c] for c in range(len(wsums)))
                )
                acc = group.add(acc, other)
            return jnp.stack([from_mont(ctx, c) for c in acc])

        return main_fn

    # -- sharded streamed-SMVP pipeline --------------------------------------
    #
    # Data-parallel over points: every chip runs the full slab-stream
    # pipeline (ops/smvp_stream.py) on its local shard; only the
    # per-window partial sums cross chips (all_gather + tree add), plus
    # one replicated slab-count scalar for the static size class.

    def _build_sharded_stream_plan_fn(self, chunk_size: int):
        ctx = self.ctx
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)
        lanes = self.stream_lanes

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, AXIS), P(None, AXIS)),
            out_specs=(
                P(AXIS),  # signed table rows: (2n+8, CWP) per chip
                P(AXIS),  # sorted_vals
                (
                    P(AXIS, None),  # starts_rk (nb, LANES)
                    P(AXIS, None),  # lens_rk
                    P(AXIS),  # osl (nb+1,)
                    P(AXIS),  # perm (num_buckets,)
                    P(AXIS),  # total_slabs (1,) per chip
                ),
                P(),  # max slab count (scalar), replicated (the one readback)
            ),
            check_vma=False,
        )
        def plan_fn(point_words, scalar_words):
            table = mont_point_table(ctx, group, point_words)
            digits = decompose_scalars_signed(
                scalar_words, chunk_size, num_windows
            )
            plan = build_bucket_plan(digits, chunk_size)
            layout = build_stream_layout(
                plan.starts, plan.lens, num_windows, lanes
            )
            smax = jax.lax.pmax(layout.total_slabs, AXIS)
            lay_tuple = (
                layout.starts_rk,
                layout.lens_rk,
                layout.osl,
                layout.perm,
                layout.total_slabs[None],
            )
            return (
                build_signed_table(group, table),
                plan.sorted_vals,
                lay_tuple,
                smax,
            )

        return plan_fn

    def _make_sharded_tail(self, chunk_size: int):
        """Shared post-SMVP reduction for every sharded main program.

        Returns tail(get_buckets): get_buckets(order) must yield the
        chip's window-major canonical bucket batch (order=None) or the
        order-composed batch (the SMVP permute gather composes the BPR
        walk for free).  Must be invoked INSIDE a shard_map body.

        Window-sharded BPR: each chip reduces only num_windows/D
        windows, so the reduction term scales with D instead of being
        replicated (the round-1 design's fixed-term ceiling on scaling
        efficiency).  Needs D | num_windows and a power-of-two D for
        the halving exchange; otherwise fall back to replicated BPR +
        window-sum tree.
        """
        ctx = self.ctx
        group = self.group
        num_windows = num_windows_for(chunk_size)
        h = 1 << (chunk_size - 1)
        bpr_threads = self.num_bpr_threads
        n_dev = self.mesh.devices.size
        window_sharded = (
            n_dev > 1
            and num_windows % n_dev == 0
            and (n_dev & (n_dev - 1)) == 0
        )
        kw = num_windows // n_dev if window_sharded else num_windows
        order = bpr_order(kw, chunk_size, bpr_threads)
        order_flat = jnp.asarray(order.reshape(-1))

        def tail(get_buckets):
            if window_sharded:
                # per-chip PARTIAL buckets, window-major
                buckets = get_buckets(None)
                # Bucket-weighted reduction is linear in the bucket
                # values, so true buckets = group-sum of the chips'
                # partials.  Reduce-scatter over the window axis by
                # recursive halving: log2(D) ppermute+add rounds, each
                # chip ends with the TRUE buckets of its window block
                # [idx*kw, (idx+1)*kw) and runs BPR on kw windows only.
                # ICI volume: ~(1 - 1/D) * bucket bytes, point-adds:
                # ~num_buckets/D per chip — both per-chip costs shrink
                # with D (vs the replicated-BPR fallback's fixed term).
                idx = jax.lax.axis_index(AXIS)
                cur = buckets
                width = num_windows
                bit = n_dev >> 1
                while bit >= 1:
                    half = width // 2
                    lo = type(cur)(*(c[:, : half * h] for c in cur))
                    hi = type(cur)(*(c[:, half * h :] for c in cur))
                    keep_low = (idx & bit) == 0
                    send = type(cur)(
                        *(
                            jnp.where(keep_low, chi, clo)
                            for clo, chi in zip(lo, hi)
                        )
                    )
                    recv = type(cur)(
                        *(
                            jax.lax.ppermute(
                                c, AXIS,
                                [(i, i ^ bit) for i in range(n_dev)],
                            )
                            for c in send
                        )
                    )
                    keep = type(cur)(
                        *(
                            jnp.where(keep_low, clo, chi)
                            for clo, chi in zip(lo, hi)
                        )
                    )
                    # lazy-domain add: closed under < LAZY_BOUND*p, and
                    # reduce_buckets' lazy chain accepts lazy seeds, so
                    # the canon happens once inside BPR's final fold
                    cur = fused_add_lazy(group, keep, recv)
                    width = half
                    bit >>= 1
                # BPR on this chip's kw true windows
                pre = type(cur)(
                    *(jnp.take(c, order_flat, axis=1) for c in cur)
                )
                wsums = reduce_buckets_prearranged(
                    group, pre, kw, chunk_size, bpr_threads
                )
                stacked = jnp.stack(
                    [from_mont(ctx, c) for c in wsums]
                )  # (C, W, kw)
                gathered = jax.lax.all_gather(stacked, AXIS)  # (D, C, W, kw)
                # chip d owns windows [d*kw, (d+1)*kw): concat in order
                return jnp.concatenate(
                    [gathered[d] for d in range(n_dev)], axis=2
                )
            buckets = get_buckets(order)
            wsums = reduce_buckets_prearranged(
                group, buckets, num_windows, chunk_size, bpr_threads
            )
            stacked = jnp.stack(list(wsums))
            gathered = jax.lax.all_gather(stacked, AXIS)  # (D, C, W, K)
            acc = type(wsums)(*(gathered[0, c] for c in range(len(wsums))))
            for d in range(1, n_dev):
                other = type(wsums)(
                    *(gathered[d, c] for c in range(len(wsums)))
                )
                acc = group.add(acc, other)
            return jnp.stack([from_mont(ctx, c) for c in acc])

        return tail

    def _build_sharded_stream_main_fn(
        self, chunk_size: int, s_slabs: int, interpret: bool = False
    ):
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)
        lanes = self.stream_lanes
        nb_total = num_windows * (1 << (chunk_size - 1)) // lanes
        tail = self._make_sharded_tail(chunk_size)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(AXIS),
                P(AXIS),
                (P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS), P(AXIS)),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def main_fn(signed_table, sorted_vals, lay_tuple):
            starts_rk, lens_rk, osl, perm, total = lay_tuple
            layout = smvp_stream.StreamLayout(
                starts_rk=starts_rk,
                lens_rk=lens_rk,
                osl=osl,
                perm=perm,
                total_slabs=total[0],
            )
            arr, outb, flags = gather_slabs(
                signed_table, sorted_vals, layout, s_slabs
            )
            blocks = accumulate_buckets_streamed(
                group, arr, outb, flags, nb_total,
                interpret=interpret, lanes=lanes,
            )
            return tail(
                lambda order: permute_buckets(
                    group, blocks, layout, order=order
                )
            )

        return main_fn

    # -- sharded packed-tree pipeline (ops/smvp_tree.py) --------------------
    #
    # The production single-chip SMVP at n >= 2^18: per-chip hybrid tree
    # (K pairwise levels + packed stream finish) on the local shard, then
    # the same window-sharded reduce-scatter tail as the stream path.
    # The plan's [maxlen, span, slabs] readback is pmax-replicated so all
    # chips (and all processes of a multi-host run) agree on the static
    # (w1_tiles, slab) classes.

    def _build_sharded_tree_plan_fn(self, chunk_size: int, tree_k):
        ctx = self.ctx
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)
        lanes = self.stream_lanes
        if tree_k is not None:
            pieces_spec = (
                P(AXIS),  # loc1 (T1cls,) per chip
                P(AXIS),  # m1
                P(AXIS),  # lens (B,) per chip (phantom-extended)
                P(AXIS, None),  # layout.starts_rk (nb, LANES)
                P(AXIS, None),  # layout.lens_rk
                P(AXIS),  # layout.osl
                P(AXIS),  # layout.perm
                P(AXIS),  # layout.total_slabs (1,) per chip
            )
        else:
            pieces_spec = (P(AXIS), P(AXIS), P(AXIS))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, AXIS), P(None, AXIS)),
            out_specs=(
                P(AXIS),  # tree table rows (2n/D + 8, R) per chip
                P(AXIS),  # sorted_vals
                pieces_spec,
                P(),  # stats, pmax-replicated (the one readback)
            ),
            check_vma=False,
        )
        def plan_fn(point_words, scalar_words):
            table = mont_point_table(ctx, group, point_words)
            digits = decompose_scalars_signed(
                scalar_words, chunk_size, num_windows
            )
            plan = build_bucket_plan(digits, chunk_size)
            kn = plan.sorted_vals.shape[0]
            if tree_k is not None:
                tplan = build_hybrid_plan(
                    plan.starts, plan.lens, kn, tree_k, num_windows, lanes
                )
                lay = tplan.layout
                pieces = (
                    tplan.loc1, tplan.m1, tplan.lens,
                    lay.starts_rk, lay.lens_rk, lay.osl, lay.perm,
                    lay.total_slabs[None],
                )
            else:
                tplan = build_tree_plan(
                    plan.starts, plan.lens, kn, num_windows
                )
                pieces = (tplan.loc1, tplan.m1, tplan.lens)
            stats = jax.lax.pmax(tplan.stats, AXIS)
            return (
                build_tree_table(group, table),
                plan.sorted_vals,
                pieces,
                stats,
            )

        return plan_fn

    def _build_sharded_hybrid_main_fn(
        self, chunk_size: int, tree_k: int, w1t: int, s_slabs: int,
        interpret: bool = False,
    ):
        group = self.group
        mesh = self.mesh
        lanes = self.stream_lanes
        tail = self._make_sharded_tail(chunk_size)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(AXIS),
                P(AXIS),
                (
                    P(AXIS), P(AXIS), P(AXIS),
                    P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                    P(AXIS),
                ),
            ),
            out_specs=P(),
            check_vma=False,
        )
        def main_fn(tree_table, sorted_vals, pieces):
            loc1, m1, lens, starts_rk, lens_rk, osl, perm, total = pieces
            layout = StreamLayout(
                starts_rk=starts_rk, lens_rk=lens_rk, osl=osl, perm=perm,
                total_slabs=total[0],
            )
            tplan = HybridPlan(
                loc1=loc1, m1=m1, lens=lens, layout=layout,
                stats=jnp.zeros((3,), jnp.int32),
            )
            blocks = tree_smvp_hybrid(
                group, tree_table, sorted_vals, tplan, tree_k, w1t,
                s_slabs, interpret=interpret, lanes=lanes,
            )
            return tail(
                lambda order: permute_buckets(
                    group, blocks, layout, order=order
                )
            )

        return main_fn

    def _build_sharded_pure_tree_main_fn(
        self, chunk_size: int, levels: int, w1t: int,
        hybrid_pieces: bool, interpret: bool = False,
    ):
        """Pure-tree sharded main: every level to a single node per
        bucket (the slab-overflow fallback for duplicate-heavy inputs,
        and the explicit smvp_mode='tree' + tree_finish=None path).
        hybrid_pieces: the plan tuple carries the (ignored) finish
        layout — its in_spec structure must match."""
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)
        tail = self._make_sharded_tail(chunk_size)
        if hybrid_pieces:
            pieces_spec = (
                P(AXIS), P(AXIS), P(AXIS),
                P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS), P(AXIS),
            )
        else:
            pieces_spec = (P(AXIS), P(AXIS), P(AXIS))

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), pieces_spec),
            out_specs=P(),
            check_vma=False,
        )
        def main_fn(tree_table, sorted_vals, pieces):
            loc1, m1, lens = pieces[:3]
            tplan = TreePlan(
                loc1=loc1, m1=m1, lens=lens,
                stats=jnp.zeros((2,), jnp.int32),
            )
            final, s_fin = tree_smvp(
                group, tree_table, sorted_vals, tplan, levels, w1t,
                interpret=interpret,
            )
            s_real = real_bucket_view(s_fin, num_windows)
            l_real = real_bucket_view(lens, num_windows)
            return tail(
                lambda order: permute_tree(
                    group, final, s_real, l_real, order=order
                )
            )

        return main_fn

    def _msm_device_sharded_tree(
        self, point_words, scalar_words, chunk_size: int
    ):
        n = point_words.shape[-1]
        d = self.mesh.devices.size
        interp = self.smvp_mode == "tree-interpret"
        tree_k = self._tree_k(max(n // d, 1))  # per-chip size class
        plan_fn = self._cache_get(
            ("sharded", self.curve, "tplan", chunk_size, n, d, tree_k,
             self.stream_lanes),
            lambda: self._build_sharded_tree_plan_fn(chunk_size, tree_k),
        )
        pw = self._put(point_words, P(None, None, AXIS))
        sw = self._put(scalar_words, P(None, AXIS))
        tree_table, sorted_vals, pieces, stats = plan_fn(pw, sw)
        stats_h = [int(v) for v in np.asarray(stats)]
        tree_k_run = tree_k
        if tree_k is not None:
            maxlen, span, total_slabs = stats_h
            s_slabs = slab_class(total_slabs, n // d)
            assert s_slabs >= total_slabs, (s_slabs, total_slabs)
            if s_slabs > SLAB_SMEM_CAP:
                # duplicate-heavy distribution on some chip: run the
                # PURE tree on the same plan (no slab maps) everywhere —
                # the classes are pmax-global, so every chip agrees
                tree_k_run = None
        else:
            maxlen, span = stats_h
        w1t = w1_tiles_for(span)
        assert w1t <= MAX_W1_TILES, (
            f"level-1 window needs {w1t} tiles > MAX_W1_TILES="
            f"{MAX_W1_TILES} (pathological bucket-boundary clustering; "
            f"use smvp_mode='stream')"
        )
        if tree_k_run is not None:
            main_fn = self._cache_get(
                (
                    "sharded", self.curve, "thmain", chunk_size, n, d,
                    tree_k_run, w1t, s_slabs, self.num_bpr_threads,
                    interp, self.stream_lanes,
                ),
                lambda: self._build_sharded_hybrid_main_fn(
                    chunk_size, tree_k_run, w1t, s_slabs, interp
                ),
            )
        else:
            levels = num_levels(maxlen)
            # plan flavor in the key: hybrid-fallback and pure plans
            # hand the main different pytree structures
            flavor = "hyb" if tree_k is not None else "pure"
            main_fn = self._cache_get(
                (
                    "sharded", self.curve, "ttmain", chunk_size, n, d,
                    levels, w1t, flavor, self.num_bpr_threads, interp,
                ),
                lambda: self._build_sharded_pure_tree_main_fn(
                    chunk_size, levels, w1t, tree_k is not None, interp
                ),
            )
        coords = main_fn(tree_table, sorted_vals, pieces)
        out = np.asarray(coords)  # (C, W, num_windows), replicated
        return tuple(out[c] for c in range(out.shape[0]))

    def _msm_device_sharded_stream(
        self, point_words, scalar_words, chunk_size: int
    ):
        n = point_words.shape[-1]
        d = self.mesh.devices.size
        interp = self.smvp_mode == "stream-interpret"
        plan_fn = self._cache_get(
            ("sharded", self.curve, "splan", chunk_size, n, d,
             self.stream_lanes),
            lambda: self._build_sharded_stream_plan_fn(chunk_size),
        )
        pw = self._put(point_words, P(None, None, AXIS))
        sw = self._put(scalar_words, P(None, AXIS))
        signed_table, sorted_vals, lay_tuple, smax = plan_fn(pw, sw)
        total = int(np.asarray(smax))
        s_slabs = slab_class(total, n // d)
        assert s_slabs >= total, (s_slabs, total)  # see cuzk.py contract
        main_fn = self._cache_get(
            (
                "sharded", self.curve, "smain", chunk_size, n, d, s_slabs,
                self.num_bpr_threads, interp, self.stream_lanes,
            ),
            lambda: self._build_sharded_stream_main_fn(
                chunk_size, s_slabs, interp
            ),
        )
        coords = main_fn(signed_table, sorted_vals, lay_tuple)
        out = np.asarray(coords)  # (C, W, num_windows), replicated
        return tuple(out[c] for c in range(out.shape[0]))

    def _put(self, host_array, spec: P):
        """Host array -> global device array sharded over the mesh.

        Single-process: a plain device_put.  Multi-process (multi-host
        pod slice): every process holds the same full host array and
        contributes only its addressable shards, via
        make_array_from_callback — the standard multihost input path.
        """
        sharding = NamedSharding(self.mesh, spec)
        if jax.process_count() == 1:
            # keep already-staged device arrays on device (the bench path
            # stages inputs once; a host round-trip here would ride the
            # ~60 MB/s tunnel)
            return jax.device_put(jnp.asarray(host_array), sharding)
        arr = np.asarray(host_array)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def msm_device(self, point_words, scalar_words, chunk_size: int):
        n = point_words.shape[-1]
        d = self.mesh.devices.size
        num_windows = num_windows_for(chunk_size)
        if n % d != 0:
            pad = d - n % d
            point_words = np.concatenate(
                [point_words, np.zeros((*point_words.shape[:-1], pad), np.uint32)],
                axis=-1,
            )
            scalar_words = np.concatenate(
                [scalar_words, np.zeros((8, pad), np.uint32)], axis=-1
            )
        # Resolve the SMVP path on the PER-CHIP shard size: the
        # tree/stream boundary (n >= 2^18, PERF.md interleaved A/B) is a
        # per-chip kernel tradeoff, and each chip runs the pipeline on
        # its local n/D points.
        path = self._select_smvp(chunk_size, max(point_words.shape[-1] // d, 1))
        if path == "tree":
            return self._msm_device_sharded_tree(
                point_words, scalar_words, chunk_size
            )
        if path == "stream":
            return self._msm_device_sharded_stream(
                point_words, scalar_words, chunk_size
            )
        pw = self._put(point_words, P(None, None, AXIS))
        sw = self._put(scalar_words, P(None, AXIS))
        n_pad = point_words.shape[-1]
        plan_fn = self._get_compiled("plan", chunk_size, n_pad)
        table_rows, sorted_vals, starts, lens, wmax = plan_fn(pw, sw)
        # window groups from the replicated per-window global max — a
        # num_windows-int readback, not the full lens array
        global_max = np.asarray(wmax)
        groups: dict[int, list[int]] = {}
        for w, m in enumerate(global_max):
            groups.setdefault(round_class(int(m)), []).append(w)
        num_coords = len(self.group.zero((1,)))
        out = [
            np.empty((self.ctx.num_words, num_windows), dtype=np.uint32)
            for _ in range(num_coords)
        ]
        for rounds, ws in sorted(groups.items()):
            ws = tuple(ws)
            main_fn = self._get_compiled(
                "main", chunk_size, n_pad, rounds, ws
            )
            stacked = np.asarray(
                main_fn(table_rows, sorted_vals, starts, lens)
            )
            for c in range(num_coords):
                out[c][:, list(ws)] = stacked[c]
        return tuple(out)

    def _get_compiled(
        self, kind: str, chunk_size: int, n: int, rounds=None, windows=None
    ):
        key = (
            "sharded",
            self.curve,
            kind,
            chunk_size,
            n,
            rounds,
            windows,
            self.num_bpr_threads,
            self.mesh.devices.size,
        )
        if kind == "plan":
            build = lambda: self._build_sharded_plan_fn(chunk_size)
        else:
            build = lambda: self._build_sharded_main_fn(
                chunk_size, rounds, windows
            )
        return self._cache_get(key, build)

    # -- pipelined sharded batch (BASELINE config 5) ------------------------
    #
    # Same schedule as the single-chip _msm_batch_tree/_msm_batch_stream,
    # with every program a sharded (shard_map) program: the point-side
    # prep runs ONCE, per-set plans enqueue back-to-back, the per-set
    # size-class readbacks batch into one host sync, and per-set mains
    # enqueue before any result is fetched — so the mesh computes set i
    # while the host walks the enqueue loop for sets i+1.. and finalizes
    # completed sets.  On a multi-host pod every process executes the
    # same enqueue order (the readbacks are pmax-replicated).

    def _build_sharded_tree_pprep_fn(self):
        ctx = self.ctx
        group = self.group

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None, None, AXIS),), out_specs=P(AXIS),
            check_vma=False,
        )
        def pprep_fn(point_words):
            return build_tree_table(
                group, mont_point_table(ctx, group, point_words)
            )

        return pprep_fn

    def _build_sharded_tree_splan_fn(self, chunk_size: int, tree_k: int):
        group = self.group
        num_windows = num_windows_for(chunk_size)
        lanes = self.stream_lanes

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None, AXIS),),
            out_specs=(
                P(AXIS),  # sorted_vals
                (
                    P(AXIS), P(AXIS), P(AXIS),
                    P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                    P(AXIS),
                ),
                P(),  # stats, pmax-replicated
            ),
            check_vma=False,
        )
        def splan_fn(scalar_words):
            digits = decompose_scalars_signed(
                scalar_words, chunk_size, num_windows
            )
            plan = build_bucket_plan(digits, chunk_size)
            kn = plan.sorted_vals.shape[0]
            tplan = build_hybrid_plan(
                plan.starts, plan.lens, kn, tree_k, num_windows, lanes
            )
            lay = tplan.layout
            pieces = (
                tplan.loc1, tplan.m1, tplan.lens,
                lay.starts_rk, lay.lens_rk, lay.osl, lay.perm,
                lay.total_slabs[None],
            )
            return (
                plan.sorted_vals,
                pieces,
                jax.lax.pmax(tplan.stats, AXIS),
            )

        return splan_fn

    def _build_sharded_stream_pprep_fn(self):
        ctx = self.ctx
        group = self.group

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None, None, AXIS),), out_specs=P(AXIS),
            check_vma=False,
        )
        def pprep_fn(point_words):
            return build_signed_table(
                group, mont_point_table(ctx, group, point_words)
            )

        return pprep_fn

    def _build_sharded_stream_splan_fn(self, chunk_size: int):
        group = self.group
        num_windows = num_windows_for(chunk_size)
        lanes = self.stream_lanes

        @partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(None, AXIS),),
            out_specs=(
                P(AXIS),  # sorted_vals
                (P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS), P(AXIS)),
                P(),  # max slab count, pmax-replicated
            ),
            check_vma=False,
        )
        def splan_fn(scalar_words):
            digits = decompose_scalars_signed(
                scalar_words, chunk_size, num_windows
            )
            plan = build_bucket_plan(digits, chunk_size)
            layout = build_stream_layout(
                plan.starts, plan.lens, num_windows, lanes
            )
            smax = jax.lax.pmax(layout.total_slabs, AXIS)
            lay_tuple = (
                layout.starts_rk, layout.lens_rk, layout.osl,
                layout.perm, layout.total_slabs[None],
            )
            return plan.sorted_vals, lay_tuple, smax

        return splan_fn

    def _msm_batch_sharded_tree(
        self, point_words, scalar_words_list, chunk_size: int
    ):
        n = point_words.shape[-1]
        d = self.mesh.devices.size
        interp = self.smvp_mode == "tree-interpret"
        tree_k = self._tree_k(max(n // d, 1)) or 2
        pprep_fn = self._cache_get(
            ("sharded", self.curve, "tpprep", n, d),
            lambda: self._build_sharded_tree_pprep_fn(),
        )
        splan_fn = self._cache_get(
            ("sharded", self.curve, "tsplan", chunk_size, n, d, tree_k,
             self.stream_lanes),
            lambda: self._build_sharded_tree_splan_fn(chunk_size, tree_k),
        )
        tree_table = pprep_fn(self._put(point_words, P(None, None, AXIS)))
        plans = [
            splan_fn(self._put(sw, P(None, AXIS)))
            for sw in scalar_words_list
        ]
        # ONE host sync for every set's (pmax-replicated) stats triple
        all_stats = np.asarray(
            jnp.stack([stats for _, _, stats in plans])
        )
        coords_batch = []
        for i, stats in enumerate(all_stats):
            sorted_vals, pieces, _ = plans[i]
            plans[i] = None
            maxlen, span, total_slabs = (int(v) for v in stats)
            w1t = w1_tiles_for(span)
            assert w1t <= MAX_W1_TILES, f"w1t={w1t} > {MAX_W1_TILES}"
            s_slabs = slab_class(total_slabs, n // d)
            if s_slabs <= SLAB_SMEM_CAP:
                main_fn = self._cache_get(
                    (
                        "sharded", self.curve, "thmain", chunk_size, n, d,
                        tree_k, w1t, s_slabs, self.num_bpr_threads,
                        interp, self.stream_lanes,
                    ),
                    lambda: self._build_sharded_hybrid_main_fn(
                        chunk_size, tree_k, w1t, s_slabs, interp
                    ),
                )
            else:  # duplicate-heavy set: pure tree on the same plan
                levels = num_levels(maxlen)
                main_fn = self._cache_get(
                    (
                        "sharded", self.curve, "ttmain", chunk_size, n, d,
                        levels, w1t, "hyb", self.num_bpr_threads, interp,
                    ),
                    lambda: self._build_sharded_pure_tree_main_fn(
                        chunk_size, levels, w1t, True, interp
                    ),
                )
            coords_batch.append(main_fn(tree_table, sorted_vals, pieces))
            del sorted_vals, pieces
        host_coords = jax.device_get(coords_batch)
        return [
            self._finalize(
                tuple(np.asarray(c) for c in coords), chunk_size
            )
            for coords in host_coords
        ]

    def _msm_batch_sharded_stream(
        self, point_words, scalar_words_list, chunk_size: int
    ):
        n = point_words.shape[-1]
        d = self.mesh.devices.size
        interp = self.smvp_mode == "stream-interpret"
        pprep_fn = self._cache_get(
            ("sharded", self.curve, "spprep", n, d),
            lambda: self._build_sharded_stream_pprep_fn(),
        )
        splan_fn = self._cache_get(
            ("sharded", self.curve, "ssplan", chunk_size, n, d,
             self.stream_lanes),
            lambda: self._build_sharded_stream_splan_fn(chunk_size),
        )
        signed_table = pprep_fn(self._put(point_words, P(None, None, AXIS)))
        plans = [
            splan_fn(self._put(sw, P(None, AXIS)))
            for sw in scalar_words_list
        ]
        all_slabs = np.asarray(
            jnp.stack([smax for _, _, smax in plans])
        )
        coords_batch = []
        for i, total in enumerate(all_slabs):
            sorted_vals, lay_tuple, _ = plans[i]
            plans[i] = None
            s_slabs = slab_class(int(total), n // d)
            assert s_slabs >= int(total), (s_slabs, int(total))
            if s_slabs > SLAB_SMEM_CAP:
                from ..models.cuzk import SlabOverflowError

                raise SlabOverflowError(
                    f"sharded batch set {i} needs {s_slabs} slabs > "
                    f"SLAB_SMEM_CAP={SLAB_SMEM_CAP}; use a tree-mode "
                    f"engine for duplicate-heavy batches"
                )
            main_fn = self._cache_get(
                (
                    "sharded", self.curve, "smain", chunk_size, n, d,
                    s_slabs, self.num_bpr_threads, interp,
                    self.stream_lanes,
                ),
                lambda: self._build_sharded_stream_main_fn(
                    chunk_size, s_slabs, interp
                ),
            )
            coords_batch.append(main_fn(signed_table, sorted_vals, lay_tuple))
            del sorted_vals, lay_tuple
        host_coords = jax.device_get(coords_batch)
        return [
            self._finalize(
                tuple(np.asarray(c) for c in coords), chunk_size
            )
            for coords in host_coords
        ]

    def compute_msm_batch(self, points, scalars_batch):
        """Pipelined batched MSM on the mesh (BASELINE config 5).

        The base class's pipelined batch builds SINGLE-device programs,
        which would silently bypass the mesh (and on a multi-host pod
        have every process redundantly compute the full MSM); this
        version pipelines SHARDED programs: one point-prep, per-set
        plans enqueued back-to-back, one batched readback, per-set
        mains enqueued before any result transfer.  Classes without a
        tree/stream resolution fall back to serial sharded runs.
        """
        point_words = self._prepare_points(points)
        n0 = point_words.shape[-1]
        d = self.mesh.devices.size
        chunk = self._chunk_for(n0)
        sws = []
        for scalars in scalars_batch:
            sw = self._prepare_scalars(scalars)
            self._validate(n0, sw)
            sws.append(sw)
        if n0 % d != 0:
            pad = d - n0 % d
            point_words = np.concatenate(
                [point_words,
                 np.zeros((*point_words.shape[:-1], pad), np.uint32)],
                axis=-1,
            )
            sws = [
                np.concatenate([sw, np.zeros((8, pad), np.uint32)], axis=-1)
                for sw in sws
            ]
        n_pad = point_words.shape[-1]
        path = self._select_smvp(chunk, max(n_pad // d, 1))
        if path == "tree":
            return self._msm_batch_sharded_tree(point_words, sws, chunk)
        if path == "stream":
            return self._msm_batch_sharded_stream(point_words, sws, chunk)
        return [
            self._finalize(self.msm_device(point_words, sw, chunk), chunk)
            for sw in sws
        ]

    def prewarm(self, n: int, chunk_size: int | None = None,
                background: bool = False):
        """Compile the sharded size-class programs ahead of time.

        The base implementation warms the single-device program keys,
        which the sharded engine never looks up; this runs one
        garbage-input MSM through the sharded msm_device (branch-free
        ops make arbitrary limb values safe), matching the keys real
        calls hit.
        """
        if background:
            import threading

            t = threading.Thread(
                target=self.prewarm, args=(n, chunk_size), daemon=True
            )
            t.start()
            return t
        chunk = chunk_size or self.chunk_size_override or choose_chunk_size(n)
        rng = np.random.RandomState(7)
        sw = rng.randint(0, 1 << 32, size=(8, n)).astype(np.uint32)
        sw[7] &= 0x1FFFFFFF
        pw = np.zeros((2, self.coord_bytes // 4, n), np.uint32)
        self.msm_device(pw, sw, chunk)
        return None
