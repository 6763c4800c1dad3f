"""Differential tests for the packed-tree SMVP (ops/smvp_tree.py).

Runs the tree level kernels in Pallas interpreter mode on CPU and checks
them bit-identical to the legacy masked-round bucket path and correct vs
the bigint oracle — the same strategy as tests/test_smvp_stream.py.
The level maps (scatter/cumsum construction) are verified against a
straightforward numpy tree construction.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine
from webgpu_msm_bls12_377_tpu.ops import buckets as dbuck
from webgpu_msm_bls12_377_tpu.ops import curve as dcurve
from webgpu_msm_bls12_377_tpu.ops import decompose as ddec
from webgpu_msm_bls12_377_tpu.ops import smvp_tree as st
from webgpu_msm_bls12_377_tpu.ops.convert import (
    ints_to_words,
    u32_words_to_limbs_mont,
)
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.msm import EDWARDS, G1, naive_msm

CHUNK = 4
NUM_WINDOWS = 64
N = 96


@pytest.fixture(scope="module")
def case():
    rng = random.Random("tree-smvp")
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 60))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    return pts, scalars


@pytest.fixture(scope="module")
def device_inputs(case):
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    xw = np.asarray(ints_to_words([a[0] for a in aff], 12))
    yw = np.asarray(ints_to_words([a[1] for a in aff], 12))
    sw = np.asarray(ints_to_words(scalars, 8))
    return xw, yw, sw


def _plan(device_inputs):
    xw, yw, sw = device_inputs
    ops = dcurve.G1Ops()
    table = jnp.stack(
        [
            u32_words_to_limbs_mont(ops.ctx, jnp.asarray(xw)),
            u32_words_to_limbs_mont(ops.ctx, jnp.asarray(yw)),
        ]
    )
    digits = ddec.decompose_scalars_signed(jnp.asarray(sw), CHUNK, NUM_WINDOWS)
    plan = dbuck.build_bucket_plan(digits, CHUNK)
    return ops, table, plan


def _numpy_levels(lens):
    """Per-level (c_k, S_k) chains, numpy."""
    chains = []
    c = np.asarray(lens).astype(np.int64)
    while True:
        c = (c + 1) // 2
        s = np.concatenate([[0], np.cumsum(c)[:-1]])
        chains.append((c, s))
        if c.max() <= 1:
            break
    return chains


def test_level_maps_match_numpy(device_inputs):
    """build_level_map's decoded children == the numpy construction."""
    _, _, plan = _plan(device_inputs)
    lens = np.asarray(plan.lens).astype(np.int64)
    starts = np.asarray(plan.starts).astype(np.int64)
    kn = int(np.asarray(plan.sorted_vals).shape[0])
    chains = _numpy_levels(lens)
    s_prev, c_prev = starts, lens
    prev_cls = st.level0_class(kn)
    t_cls_chain = st.level_classes(kn, lens.shape[0], len(chains))
    for lv, (c_k, s_k) in enumerate(chains):
        t_cls = t_cls_chain[lv]
        loc, m, span = jax.jit(
            lambda sp, cp, sk, ck: st.build_level_map(
                sp, cp, sk, ck, t_cls, prev_cls // st.BLOCK, 3
            )
        )(
            jnp.asarray(s_prev, jnp.int32),
            jnp.asarray(c_prev, jnp.int32),
            jnp.asarray(s_k, jnp.int32),
            jnp.asarray(c_k, jnp.int32),
        )
        loc, m = np.asarray(loc), np.asarray(m)
        t_k = int(s_k[-1] + c_k[-1])
        # decode every valid slot and compare children
        for b in np.random.default_rng(lv).integers(
            0, lens.shape[0], size=64
        ):
            for j in range(int(c_k[b])):
                p = int(s_k[b] + j)
                assert not (loc[p] & st.FLAG_INVALID)
                child_a = loc[p] & st.LOC_MASK
                abs_a = child_a + st.BLOCK * int(m[p // st.BLOCK])
                want_a = int(s_prev[b] + 2 * j)
                assert abs_a == want_a, (lv, b, j)
                is_single = 2 * j + 1 >= int(c_prev[b])
                assert bool(loc[p] & st.FLAG_SINGLE) == is_single
        assert np.all(loc[t_k:] == st.FLAG_INVALID)
        assert int(span) <= 768  # chunk-4 windows have tiny gaps
        s_prev, c_prev = s_k, c_k
        prev_cls = t_cls


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_tree_matches_legacy_buckets(device_inputs):
    """Tree kernels (interpret) == legacy masked-round path, bit-exact."""
    ops, table, plan = _plan(device_inputs)
    rounds = dbuck.round_class(int(np.asarray(plan.lens).max()))
    legacy = jax.jit(
        lambda t, p: dbuck.accumulate_buckets(
            ops, dbuck.table_to_rows(t), p, rounds
        )
    )(table, plan)

    kn = int(plan.sorted_vals.shape[0])
    tplan = jax.jit(
        lambda s, l: st.build_tree_plan(s, l, kn, NUM_WINDOWS)
    )(plan.starts, plan.lens)
    maxlen, span = (int(v) for v in np.asarray(tplan.stats))
    levels = st.num_levels(maxlen)
    w1t = st.w1_tiles_for(span)
    ttable = jax.jit(lambda t: st.build_tree_table(ops, t))(table)
    final, s_fin = st.tree_smvp(
        ops, ttable, plan.sorted_vals, tplan, levels, w1t, interpret=True
    )
    # plan.lens / s_fin are phantom-extended (one tail bucket per window)
    got = st.permute_tree(
        ops,
        final,
        st.real_bucket_view(s_fin, NUM_WINDOWS),
        st.real_bucket_view(tplan.lens, NUM_WINDOWS),
    )
    # The tree adds in a different (balanced) order, so projective
    # REPRESENTATIVES differ from the sequential legacy walk; compare as
    # group elements via the oracle's projective equality.
    w = ops.ctx.word_size
    ga = [np.asarray(c) for c in got]
    la = [np.asarray(c) for c in legacy]
    from webgpu_msm_bls12_377_tpu.reference.limbs import (
        from_words_le_unchecked,
    )

    def pt(arrs, j):
        return crv.ProjectivePoint(
            *(from_words_le_unchecked(a[:, j].tolist(), w) for a in arrs)
        )

    for j in range(ga[0].shape[1]):
        assert crv.g1_eq(pt(ga, j), pt(la, j)), j


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_tree_engine_end_to_end(case):
    """Interpret-mode tree engine == oracle through the public API."""
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="tree-interpret"
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_tree_engine_edwards(case):
    """Edwards curve through the tree path (3 affine coords, 4 state)."""
    rng = random.Random("tree-ed")
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 60))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    aff = [crv.ed_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.EDWARDS_BLS12, chunk_size=CHUNK, smvp_mode="tree-interpret"
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.ed_to_affine(naive_msm(pts, scalars, EDWARDS))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
@pytest.mark.parametrize("k_finish", [1, 2])
def test_hybrid_engine_end_to_end(case, k_finish):
    """Tree levels 1..K + packed stream finish == oracle (interpret).

    stream_lanes=8 so chunk-4 windows (h = 8 buckets) form whole
    finish-kernel blocks."""
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="tree-interpret",
        tree_finish=k_finish, stream_lanes=8,
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_hybrid_engine_edwards(case):
    """Edwards through the hybrid path (4 projective state coords)."""
    rng = random.Random("tree-ed-h")
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 60))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    aff = [crv.ed_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.EDWARDS_BLS12, chunk_size=CHUNK,
        smvp_mode="tree-interpret", tree_finish=1, stream_lanes=8,
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.ed_to_affine(naive_msm(pts, scalars, EDWARDS))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_hybrid_engine_duplicate_heavy(case):
    """Hot-bucket inputs through the hybrid: one bucket per window holds
    ALL entries — the finish kernel's block runs maxlen/2 rounds."""
    pts, _ = case
    aff = [crv.g1_to_affine(p) for p in pts]
    s = 0x1234_5678_9ABC_DEF0
    scalars = [s] * N
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="tree-interpret",
        tree_finish=1, stream_lanes=8,
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # giant interpret-mode XLA:CPU compiles: beyond ~200
# compiles/process this environment's XLA:CPU backend_compile_and_load
# intermittently SEGFAULTS (3 full-suite crashes observed, always in
# this file's heavy tests; each passes in isolation).  The light tier
# below (level maps vs numpy, wide-window regression) keeps tree
# coverage in the default run; these e2e paths also run compiled in the
# TPU tier (tests/test_tpu_kernels.py) and every TPU bench run.
def test_tree_engine_duplicate_heavy(case):
    """Hot-bucket inputs (every scalar equal): one bucket per window
    holds ALL entries — the deepest trees and maximal single-chains."""
    pts, _ = case
    aff = [crv.g1_to_affine(p) for p in pts]
    s = 0x1234_5678_9ABC_DEF0
    scalars = [s] * N
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="tree-interpret"
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


def test_level_map_wide_window_not_clipped():
    """Round-4 wrong-result regression: when bucket-boundary offset
    jumps push a block's child window past 3 tiles (768 slots), the
    plan must NOT clip the window-local child index at the 3-tile
    bound — the kernel sizes its tile window from the span readback
    (w1_tiles_for), so the plan's clip cap must be MAX_W1_TILES.

    At BLS12-377 chunk-15 n=2^20 the real data produced span 551 ->
    4 tiles with 5 slots above the old 766 clip; this synthesizes the
    same geometry small: one big inter-bucket start jump (a skipped
    sorted tail) inside a block."""
    B = 512
    lens = np.full(B, 2, np.int64)
    starts = np.cumsum(lens) - lens
    # bucket 300: its segment starts 900 slots later (skipped tail)
    starts[300:] += 900
    kn = int(starts[-1] + lens[-1])
    c1 = (lens + 1) >> 1
    s1 = np.cumsum(c1) - c1
    t1_cls = st.level_classes(kn, B, 1)[0]
    t0_tiles = st.level0_class(kn) // st.BLOCK
    loc, m, span = jax.jit(
        lambda s, l, sk, ck: st.build_level_map(
            s, l, sk, ck, t1_cls, t0_tiles, 3
        )
    )(
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(lens, jnp.int32),
        jnp.asarray(s1, jnp.int32),
        jnp.asarray(c1, jnp.int32),
    )
    loc, m, span = np.asarray(loc), np.asarray(m), int(np.asarray(span))
    w1t = st.w1_tiles_for(span)
    assert w1t > 3, "synthesized case must need a wide window"
    t1 = int(s1[-1] + c1[-1])
    # every valid slot's reconstructed absolute childA must be exact
    # (the old clip broke exactly this) and fit the chosen window
    for p in range(t1):
        slot = loc[p]
        assert slot != st.FLAG_INVALID
        base = slot & st.LOC_MASK
        absa = int(m[p // st.BLOCK]) * st.BLOCK + base
        b = np.searchsorted(s1, p, side="right") - 1
        want_a = int(starts[b] + 2 * (p - s1[b]))
        assert absa == want_a, (p, absa, want_a)
        single = bool(slot & st.FLAG_SINGLE)
        need = base + (1 if single else 2)
        assert need <= w1t * st.BLOCK, (p, need, w1t)
