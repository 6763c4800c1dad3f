"""Differential tests for the fused segment-DMA SMVP (ops/smvp_kernel.py).

Runs the fused kernel in Pallas interpreter mode on CPU and checks it is
bit-identical to the legacy per-round masked-add path and correct vs the
bigint oracle — same strategy as the round-1 pipeline-stage tests.

Marked slow: the manual-DMA kernel under the Pallas interpreter costs
~17 min of CPU; the production streamed path (test_smvp_stream.py) keeps
the fast suite's coverage of the fused-SMVP engine modes.
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
from webgpu_msm_bls12_377_tpu.ops.convert import (
    ints_to_words,
    u32_words_to_limbs_mont,
)
from webgpu_msm_bls12_377_tpu.ops.smvp_kernel import (
    accumulate_buckets_fused,
    accumulate_buckets_windowed,
    make_wide_rows,
    pregather_signed,
    segment_plan,
)
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

pytestmark = pytest.mark.slow

CHUNK = 4
NUM_WINDOWS = 64
N = 96


@pytest.fixture(scope="module")
def case():
    rng = random.Random("fused-smvp")
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


def test_fused_matches_legacy_buckets(device_inputs):
    """Fused kernel (interpret) == legacy masked-round path, bit-exact."""
    ops, table, plan = _plan(device_inputs)
    rounds = dbuck.round_class(int(np.asarray(plan.lens).max()))
    legacy = jax.jit(
        lambda t, p: dbuck.accumulate_buckets(
            ops, dbuck.table_to_rows(t), p, rounds
        )
    )(table, plan)

    gathered = jax.jit(
        lambda t, v: pregather_signed(ops, make_wide_rows(ops, t), v)
    )(table, plan.sorted_vals)
    seg = segment_plan(plan.starts, plan.lens)
    fused = accumulate_buckets_fused(ops, gathered, seg, interpret=True)

    for cf, cl in zip(fused, legacy):
        assert np.array_equal(np.asarray(cf), np.asarray(cl))


def test_windowed_matches_single_dispatch(device_inputs):
    """Per-window fused driver == single-dispatch fused path, bit-exact.

    Uses a lane block small enough that the per-window grid exists
    (h = 8 lanes per window at CHUNK=4 -> monkeypatched BLOCK)."""
    from webgpu_msm_bls12_377_tpu.ops import smvp_kernel as sk

    ops, table, plan = _plan(device_inputs)
    rows = jax.jit(lambda t: make_wide_rows(ops, t))(table)
    gathered = jax.jit(lambda r, v: pregather_signed(ops, r, v))(
        rows, plan.sorted_vals
    )
    seg = segment_plan(plan.starts, plan.lens)
    single = accumulate_buckets_fused(ops, gathered, seg, interpret=True)

    old_block = sk.BLOCK
    sk.BLOCK = 8  # h per window at CHUNK=4
    try:
        windowed = accumulate_buckets_windowed(
            ops, rows, plan.sorted_vals, plan.starts, plan.lens,
            NUM_WINDOWS, interpret=True,
        )
    finally:
        sk.BLOCK = old_block
    for cw, cs in zip(windowed, single):
        assert np.array_equal(np.asarray(cw), np.asarray(cs))


def test_fused_engine_end_to_end(case):
    """Interpret-mode fused engine == oracle through the public API."""
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="interpret"
    )
    assert eng._fused_ok(CHUNK, N)
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


def test_fused_engine_edwards(case):
    """Edwards curve through the fused path (3 affine coords + sign)."""
    rng = random.Random("fused-ed")
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 60))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    aff = [crv.ed_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.EDWARDS_BLS12, chunk_size=CHUNK, smvp_mode="interpret"
    )
    got = eng.compute_msm(aff, scalars)
    from webgpu_msm_bls12_377_tpu.reference.msm import EDWARDS

    want = crv.ed_to_affine(naive_msm(pts, scalars, EDWARDS))
    assert (got["x"], got["y"]) == want
