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
    SCALAR_BITS,
    CuzkMsmEngine,
    choose_chunk_size,
    mont_point_table,
    num_windows_for,
)
from ..ops.bpr import bpr_order, reduce_buckets, reduce_buckets_prearranged
from ..ops.pallas_kernels import fused_add, fused_add_lazy
from ..ops.buckets import (
    BucketPlan,
    accumulate_buckets,
    build_bucket_plan,
    round_class,
    table_to_rows,
    window_slice_indices,
)
from ..ops.convert import u32_words_to_limbs_mont
from ..ops.decompose import decompose_scalars_signed
from ..ops.field import from_mont, mont_mul
from ..ops.curve import EdwardsOps
from ..ops import smvp_stream
from ..ops.smvp_stream import (
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

    def _build_sharded_stream_main_fn(
        self, chunk_size: int, s_slabs: int, interpret: bool = False
    ):
        ctx = self.ctx
        group = self.group
        mesh = self.mesh
        num_windows = num_windows_for(chunk_size)
        h = 1 << (chunk_size - 1)
        lanes = self.stream_lanes
        nb_total = num_windows * h // lanes
        bpr_threads = self.num_bpr_threads
        n_dev = mesh.devices.size
        # Window-sharded BPR (see main_fn): each chip reduces only
        # num_windows/D windows, so the reduction term scales with D
        # instead of being replicated (the round-1 design's fixed-term
        # ceiling on scaling efficiency).  Needs D | num_windows and a
        # power-of-two D for the halving exchange; otherwise fall back
        # to replicated BPR + window-sum tree.
        window_sharded = (
            n_dev > 1
            and num_windows % n_dev == 0
            and (n_dev & (n_dev - 1)) == 0
        )
        kw = num_windows // n_dev if window_sharded else num_windows
        order = bpr_order(kw, chunk_size, bpr_threads)
        order_flat = jnp.asarray(order.reshape(-1))

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
            if window_sharded:
                # per-chip PARTIAL buckets, window-major
                buckets = permute_buckets(group, blocks, layout)
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
            buckets = permute_buckets(group, blocks, layout, order=order)
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

        return main_fn

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
        # auto-resolved "tree" implies stream support (_select_smvp); the
        # sharded pipeline has no tree path yet, so it rides the sharded
        # stream (the window-sharded BPR consumes stream bucket blocks)
        if self._select_smvp(chunk_size, n) in ("stream", "tree"):
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
            coords = main_fn(table_rows, sorted_vals, starts, lens)
            for c in range(num_coords):
                out[c][:, list(ws)] = np.asarray(coords[c])
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

    def compute_msm_batch(self, points, scalars_batch):
        """Batched MSM on the mesh: serial sharded runs.

        The base class's pipelined _msm_batch_stream builds SINGLE-device
        programs, which would silently bypass the mesh (and on a
        multi-host pod have every process redundantly compute the full
        MSM); each set here runs through the sharded msm_device instead.
        Compiled programs are shared across the batch via the size-class
        cache, so only the first set pays compilation.
        """
        point_words = self._prepare_points(points)
        results = []
        for scalars in scalars_batch:
            sw = self._prepare_scalars(scalars)
            self._validate(point_words.shape[-1], sw)
            chunk = self.chunk_size_override or choose_chunk_size(
                point_words.shape[-1]
            )
            coords = self.msm_device(point_words, sw, chunk)
            results.append(self._finalize(coords, chunk))
        return results

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
