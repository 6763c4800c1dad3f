"""Differential tests for the streamed slab SMVP (ops/smvp_stream.py).

Runs the stream kernel in Pallas interpreter mode on CPU and checks it is
bit-identical to the legacy masked-round path and correct vs the bigint
oracle — the same strategy as tests/test_smvp_fused.py.  LANES is
monkeypatched to 8 so chunk-4 windows (h=8) exercise multi-block layouts
at test-friendly sizes.
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
from webgpu_msm_bls12_377_tpu.ops import smvp_stream as ss
from webgpu_msm_bls12_377_tpu.ops.convert import (
    ints_to_words,
    u32_words_to_limbs_mont,
)
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

CHUNK = 4
NUM_WINDOWS = 64
N = 96


@pytest.fixture(autouse=True)
def small_lanes(monkeypatch):
    monkeypatch.setattr(ss, "LANES", 8)


@pytest.fixture(scope="module")
def case():
    rng = random.Random("stream-smvp")
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


def test_take_rows_t_chunked_matches_monolithic(monkeypatch):
    """The piecewise gather+transpose (the HBM-cliff fix for the
    Edwards 2^20 chunk-15 crash) is bit-identical to take(...).T,
    including the zero-padded out_rows form."""
    rng = np.random.default_rng(7)
    table = jnp.asarray(
        rng.integers(0, 1 << 32, size=(500, 16), dtype=np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, 500, size=4096, dtype=np.int32))
    want = np.asarray(jnp.take(table, idx, axis=0).T)
    monkeypatch.setattr(ss, "TRANSPOSE_PIECE_BYTES", 32 << 10)  # 13 pieces
    got = np.asarray(jax.jit(ss._take_rows_T)(table, idx))
    assert np.array_equal(got, want)
    got_pad = np.asarray(
        jax.jit(lambda t, i: ss._take_rows_T(t, i, out_rows=24))(table, idx)
    )
    assert np.array_equal(got_pad[:16], want)
    assert np.all(got_pad[16:] == 0)


def test_layout_matches_numpy(device_inputs):
    """build_stream_layout == a straightforward numpy construction."""
    _, _, plan = _plan(device_inputs)
    layout = jax.jit(
        lambda s, l: ss.build_stream_layout(s, l, NUM_WINDOWS)
    )(plan.starts, plan.lens)

    lens = np.asarray(plan.lens).reshape(NUM_WINDOWS, -1)
    starts = np.asarray(plan.starts).reshape(NUM_WINDOWS, -1)
    h = lens.shape[1]
    order = np.argsort(-lens, axis=1, kind="stable")
    lens_rk = np.take_along_axis(lens, order, axis=1).reshape(-1, ss.LANES)
    lb = lens_rk.max(axis=1)
    assert np.array_equal(np.asarray(layout.lens_rk).max(axis=1), lb)
    assert int(np.asarray(layout.total_slabs)) == int(lb.sum())
    # perm sends bucket (w, j) to lane w*h + rank_w(j): applying it to the
    # rank-ordered starts must reproduce the window-major starts
    st = np.asarray(layout.starts_rk).reshape(-1)
    assert np.array_equal(st[np.asarray(layout.perm)], starts.reshape(-1))


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_matches_legacy_buckets(device_inputs):
    """Stream kernel (interpret) == legacy masked-round path, bit-exact."""
    ops, table, plan = _plan(device_inputs)
    rounds = dbuck.round_class(int(np.asarray(plan.lens).max()))
    legacy = jax.jit(
        lambda t, p: dbuck.accumulate_buckets(
            ops, dbuck.table_to_rows(t), p, rounds
        )
    )(table, plan)

    layout = jax.jit(
        lambda s, l: ss.build_stream_layout(s, l, NUM_WINDOWS)
    )(plan.starts, plan.lens)
    stable = jax.jit(lambda t: ss.build_signed_table(ops, t))(table)
    s_slabs = ss.slab_class(int(np.asarray(layout.total_slabs)), N)
    arr, outb, flags = jax.jit(
        lambda st, sv, lo: ss.gather_slabs(st, sv, lo, s_slabs)
    )(stable, plan.sorted_vals, layout)
    nb_total = NUM_WINDOWS * (1 << (CHUNK - 1)) // ss.LANES
    blocks = ss.accumulate_buckets_streamed(
        ops, arr, outb, flags, nb_total, interpret=True
    )
    got = ss.permute_buckets(ops, blocks, layout)

    for cg, cl in zip(got, legacy):
        assert np.array_equal(np.asarray(cg), np.asarray(cl))


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_engine_end_to_end(case):
    """Interpret-mode stream engine == oracle through the public API."""
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    got = eng.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_batch_pipeline(case):
    """compute_msm_batch routes through the pipelined stream schedule
    (shared signed table, split plan programs) and matches per-set
    serial results."""
    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    rng = random.Random("stream-batch")
    sets = [
        [rng.randrange(0, 1 << 253) for _ in range(N)] for _ in range(3)
    ]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    got = eng.compute_msm_batch(aff, sets)
    for res, s in zip(got, sets):
        want = crv.g1_to_affine(naive_msm(pts, s, G1))
        assert (res["x"], res["y"]) == want


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_engine_edwards(case):
    """Edwards curve through the streamed path (3 affine coords)."""
    rng = random.Random("stream-ed")
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 60))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    aff = [crv.ed_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.EDWARDS_BLS12, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    got = eng.compute_msm(aff, scalars)
    from webgpu_msm_bls12_377_tpu.reference.msm import EDWARDS

    want = crv.ed_to_affine(naive_msm(pts, scalars, EDWARDS))
    assert (got["x"], got["y"]) == want


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_batched_msm_device_pool(case):
    """Set-parallel batch over a device pool: 4 sets round-robined over
    4 virtual devices, each set's whole pipeline on its own device
    (the reference's worker-pool analogue, wasmMSM.ts)."""
    pts, scalars = case
    rng = random.Random("stream-pool")
    sets = [scalars] + [
        [rng.randrange(0, 1 << 253) for _ in range(N)] for _ in range(3)
    ]
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    devices = jax.devices()[:4]
    assert len(devices) == 4  # conftest pins an 8-virtual-device CPU mesh
    results = eng.compute_msm_batch(aff, sets, devices=devices)
    for got, ks in zip(results, sets):
        want = crv.g1_to_affine(naive_msm(pts, ks, G1))
        assert (got["x"], got["y"]) == want


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_stream_batched_msm(case):
    """compute_msm_batch through the pipelined stream path (interpret):
    shared signed table, per-set plans, one slab-count sync."""
    pts, scalars = case
    rng = random.Random("stream-batch2")
    scalars2 = [rng.randrange(0, 1 << 253) for _ in range(N)]
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    results = eng.compute_msm_batch(aff, [scalars, scalars2])
    for got, ks in zip(results, (scalars, scalars2)):
        want = crv.g1_to_affine(naive_msm(pts, ks, G1))
        assert (got["x"], got["y"]) == want


@pytest.mark.slow  # ~45 s of interpret compiles (suite budget)
def test_stream_batch_overflow_raises_clearly(case, monkeypatch):
    """A duplicate-heavy set whose slab count exceeds SLAB_SMEM_CAP must
    surface SlabOverflowError from the pipelined batch when no tree
    backend exists (CPU) — not a raw SMEM compile error (round-4
    advisor item; on TPU the engine falls back to the pure tree
    per set instead)."""
    import webgpu_msm_bls12_377_tpu.models.cuzk as cuzk_mod
    from webgpu_msm_bls12_377_tpu.models.cuzk import SlabOverflowError

    pts, scalars = case
    aff = [crv.g1_to_affine(p) for p in pts]
    # all-equal scalars concentrate every window's entries in ONE
    # bucket; with the cap patched tiny, that set overflows while the
    # uniform set stays under
    heavy = [scalars[0]] * N
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=CHUNK, smvp_mode="stream-interpret"
    )
    # cap between the two sets' classes: uniform ~1152 slabs, heavy
    # (one monster bucket per window) ~6k
    monkeypatch.setattr(cuzk_mod, "SLAB_SMEM_CAP", 2000)
    results = eng.compute_msm_batch(aff, [scalars])
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (results[0]["x"], results[0]["y"]) == want
    with pytest.raises(SlabOverflowError):
        eng.compute_msm_batch(aff, [scalars, heavy])
