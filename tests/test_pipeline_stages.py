"""Per-stage differential tests for the device cuZK pipeline.

Mirrors the reference's debug-mode stage checks (submission.ts:464-520
decompose, :612-641 transpose, :723-798 SMVP, :901-1012 BPR): every device
stage is compared against a CPU model.  Stages whose addition *order*
differs from the reference model by design (sort-based SMVP interleaves
signs) are compared as group elements (affine), not raw limbs.
"""

import functools
import random

import jax
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.ops import bpr as dbpr
from webgpu_msm_bls12_377_tpu.ops import buckets as dbuck
from webgpu_msm_bls12_377_tpu.ops import curve as dcurve
from webgpu_msm_bls12_377_tpu.ops import decompose as ddec
from webgpu_msm_bls12_377_tpu.ops import field as dfield
from webgpu_msm_bls12_377_tpu.ops.convert import (
    ints_to_words,
    limbs_from_u32_words,
    u32_words_to_limbs_mont,
)
from webgpu_msm_bls12_377_tpu.params import CurveId, mont_params_for
from webgpu_msm_bls12_377_tpu.reference import curve as ocurve
from webgpu_msm_bls12_377_tpu.reference import msm as omsm
from webgpu_msm_bls12_377_tpu.reference.limbs import (
    decompose_scalars_signed as oracle_decompose,
    from_words_le_unchecked,
)

CHUNK = 4
H = 1 << (CHUNK - 1)
NUM_WINDOWS = 64
N = 32


@pytest.fixture(scope="module")
def case():
    rng = random.Random("stages")
    pts = [
        ocurve.g1_scalar_mult(ocurve.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    scalars[0] = 0
    return pts, scalars


def test_convert_limbs_and_mont(case):
    """Stage 1a: wire word repack + Montgomery entry, limb-exact."""
    pts, _ = case
    params = mont_params_for(CurveId.BLS12_377)
    ctx = dfield.field_ctx(CurveId.BLS12_377)
    xs = [ocurve.g1_to_affine(p)[0] for p in pts]
    words = np.asarray(ints_to_words(xs, 12))
    limbs = np.asarray(
        jax.jit(
            lambda w: limbs_from_u32_words(w, params.num_words, params.word_size)
        )(words)
    )
    for j, x in enumerate(xs):
        assert (
            from_words_le_unchecked(limbs[:, j].tolist(), params.word_size)
            == x
        )
    mont = np.asarray(jax.jit(lambda w: u32_words_to_limbs_mont(ctx, w))(words))
    for j, x in enumerate(xs):
        assert (
            from_words_le_unchecked(mont[:, j].tolist(), params.word_size)
            == (x * params.r) % params.p
        )


def test_decompose_matches_oracle(case):
    """Stage 1b: stored signed digits, exact equality with utils.ts model."""
    _, scalars = case
    words = np.asarray(ints_to_words(scalars, 8))
    got = np.asarray(
        jax.jit(
            lambda w: ddec.decompose_scalars_signed(w, CHUNK, NUM_WINDOWS)
        )(words)
    )
    want = oracle_decompose(scalars, NUM_WINDOWS, CHUNK)
    assert got.tolist() == want


def slot_sign(d):
    if d == H:
        return None, None
    if d == 0:
        return 0, -1
    if d > H:
        return d - H, 1
    return H - d, -1


def bucket_model(pts, scalars):
    """CPU model of the sort-based SMVP (signed bucket sums per window)."""
    digits = oracle_decompose(scalars, NUM_WINDOWS, CHUNK)
    buckets = [
        [ocurve.G1_ZERO] * H for _ in range(NUM_WINDOWS)
    ]
    for w in range(NUM_WINDOWS):
        for i, d in enumerate(digits[w]):
            slot, sign = slot_sign(d)
            if slot is None:
                continue
            p = pts[i] if sign > 0 else ocurve.g1_neg(pts[i])
            buckets[w][slot] = ocurve.g1_add(buckets[w][slot], p)
    return buckets


@pytest.fixture(scope="module")
def device_buckets(case):
    pts, scalars = case
    ctx = dfield.field_ctx(CurveId.BLS12_377)
    ops = dcurve.G1Ops()
    aff = [ocurve.g1_to_affine(p) for p in pts]
    xw = np.asarray(ints_to_words([a[0] for a in aff], 12))
    yw = np.asarray(ints_to_words([a[1] for a in aff], 12))
    sw = np.asarray(ints_to_words(scalars, 8))

    @jax.jit
    def plan_fn(xw, yw, sw):
        import jax.numpy as jnp

        table = jnp.stack(
            [
                u32_words_to_limbs_mont(ctx, xw),
                u32_words_to_limbs_mont(ctx, yw),
            ]
        )
        digits = ddec.decompose_scalars_signed(sw, CHUNK, NUM_WINDOWS)
        return dbuck.table_to_rows(table), dbuck.build_bucket_plan(digits, CHUNK)

    table_rows, plan = plan_fn(xw, yw, sw)
    rounds = dbuck.round_class(int(np.asarray(plan.lens).max()))
    acc = jax.jit(
        lambda t, p: dbuck.accumulate_buckets(ops, t, p, rounds)
    )(table_rows, plan)
    return acc


def to_oracle_points(point_batch):
    ctx = dfield.field_ctx(CurveId.BLS12_377)
    params = ctx.params
    coords = [
        np.asarray(jax.jit(lambda c: dfield.from_mont(ctx, c))(c))
        for c in point_batch
    ]
    out = []
    for j in range(coords[0].shape[1]):
        vals = [
            from_words_le_unchecked(c[:, j].tolist(), params.word_size)
            for c in coords
        ]
        out.append(ocurve.ProjectivePoint(*vals))
    return out


def test_bucket_accumulation_vs_model(case, device_buckets):
    """Stages 2+3: every bucket equals the CPU model as a group element."""
    pts, scalars = case
    want = bucket_model(pts, scalars)
    got = to_oracle_points(device_buckets)
    assert len(got) == NUM_WINDOWS * H
    for w in range(NUM_WINDOWS):
        for s in range(H):
            g = got[w * H + s]
            assert ocurve.g1_eq(g, want[w][s]), f"window {w} slot {s}"


def test_bpr_vs_running_sum(case, device_buckets):
    """Stage 4: window sums equal the serial running-sum reduction."""
    pts, scalars = case
    ops = dcurve.G1Ops()
    wsums = jax.jit(
        lambda b: dbpr.reduce_buckets(ops, b, NUM_WINDOWS, CHUNK, 8)
    )(device_buckets)
    got = to_oracle_points(wsums)
    model = bucket_model(pts, scalars)
    for w in range(NUM_WINDOWS):
        want = omsm.running_sum_bucket_reduction(model[w], omsm.G1)
        assert ocurve.g1_eq(got[w], want), f"window {w}"


def test_full_window_reconstruction(case, device_buckets):
    """End-to-end invariant: Horner over window sums == naive MSM."""
    pts, scalars = case
    ops = dcurve.G1Ops()
    wsums = jax.jit(
        lambda b: dbpr.reduce_buckets(ops, b, NUM_WINDOWS, CHUNK, 8)
    )(device_buckets)
    got = omsm.horner(to_oracle_points(wsums), CHUNK, omsm.G1)
    want = omsm.naive_msm(pts, scalars, omsm.G1)
    assert ocurve.g1_eq(got, want)


def test_segment_bounds_matches_searchsorted():
    """segment_bounds == searchsorted(sorted_keys, arange(B+1)) on random,
    clustered, and edge-shaped inputs (incl. non-multiple-of-stride)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    cases = []
    for m, b in [(1024, 64), (1000, 64), (33, 8), (1, 4), (4096, 4096)]:
        keys = np.sort(rng.integers(0, b, size=m)).astype(np.int32)
        cases.append((keys, b))
    # clustered: all keys equal / empty buckets at both ends
    cases.append((np.full(512, 5, np.int32), 16))
    cases.append((np.zeros(100, np.int32), 8))
    cases.append((np.full(100, 7, np.int32), 8))
    for keys, b in cases:
        got = np.asarray(
            jax.jit(lambda k: dbuck.segment_bounds(jnp.asarray(k), b))(keys)
        )
        want = np.searchsorted(keys, np.arange(b + 1), side="left")
        assert got.tolist() == want.tolist(), (len(keys), b)


def test_bpr_prearranged_matches_direct(case, device_buckets):
    """reduce_buckets_prearranged(buckets[bpr_order]) == reduce_buckets."""
    import jax.numpy as jnp

    ops = dcurve.G1Ops()
    want = jax.jit(
        lambda b: dbpr.reduce_buckets(ops, b, NUM_WINDOWS, CHUNK, 8)
    )(device_buckets)
    order = dbpr.bpr_order(NUM_WINDOWS, CHUNK, 8)
    flat = jnp.asarray(order.reshape(-1))
    pre = type(device_buckets)(
        *(jnp.take(c, flat, axis=1) for c in device_buckets)
    )
    got = jax.jit(
        lambda b: dbpr.reduce_buckets_prearranged(ops, b, NUM_WINDOWS, CHUNK, 8)
    )(pre)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
