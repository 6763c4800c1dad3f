"""End-to-end engine tests: full cuZK pipeline vs the naive MSM oracle.

The miniature-pipeline strategy mirrors the reference's cuzk.test.ts
(small n, small chunk_size, equality with the naive sum), plus wire-format
(byte buffer) input paths and a second chunk-size class for generality.
"""

import random

import pytest

from webgpu_msm_bls12_377_tpu import compute_msm, compute_msm_edwards
from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.limbs import bigints_to_buffer_le
from webgpu_msm_bls12_377_tpu.reference.msm import EDWARDS, G1, naive_msm

N = 24  # one size class -> one compile shared by every test in this module


@pytest.fixture(scope="module")
def g1_case():
    rng = random.Random("engine-g1")
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    # include edge scalars: 0, 1, max window patterns
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = (1 << 253) - 1
    expected = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    return pts, scalars, expected


@pytest.fixture(scope="module")
def ed_case():
    rng = random.Random("engine-ed")
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(N)
    ]
    scalars = [rng.randrange(0, 1 << 253) for _ in range(N)]
    scalars[0] = 0
    expected = crv.ed_to_affine(naive_msm(pts, scalars, EDWARDS))
    return pts, scalars, expected


def test_g1_int_inputs(g1_case):
    pts, scalars, expected = g1_case
    aff = [crv.g1_to_affine(p) for p in pts]
    got = compute_msm(aff, scalars)
    assert (got["x"], got["y"]) == expected


def test_g1_buffer_inputs(g1_case):
    """Reference wire format: 96-byte points, 32-byte scalars (LE)."""
    pts, scalars, expected = g1_case
    coords = []
    for p in pts:
        x, y = crv.g1_to_affine(p)
        coords.extend([x, y])
    points_buf = bigints_to_buffer_le(coords, 48)
    scalars_buf = bigints_to_buffer_le(scalars, 32)
    got = compute_msm(points_buf, scalars_buf)
    assert (got["x"], got["y"]) == expected


def test_edwards_int_inputs(ed_case):
    pts, scalars, expected = ed_case
    aff = [crv.ed_to_affine(p) for p in pts]
    got = compute_msm_edwards(aff, scalars)
    assert (got["x"], got["y"]) == expected


def test_edwards_buffer_inputs(ed_case):
    pts, scalars, expected = ed_case
    coords = []
    for p in pts:
        x, y = crv.ed_to_affine(p)
        coords.extend([x, y])
    points_buf = bigints_to_buffer_le(coords, 32)
    scalars_buf = bigints_to_buffer_le(scalars, 32)
    got = compute_msm_edwards(points_buf, scalars_buf)
    assert (got["x"], got["y"]) == expected


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_g1_chunk_size_8(g1_case):
    """A second window-size class exercises generic decomposition/BPR."""
    pts, scalars, expected = g1_case
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(CurveId.BLS12_377, chunk_size=8)
    got = eng.compute_msm(aff, scalars)
    assert (got["x"], got["y"]) == expected


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
@pytest.mark.parametrize("chunk", [13, 15])
def test_g1_odd_chunk_top_window(g1_case, chunk):
    """Chunk sizes not dividing 256 need the ceil-253 window rule
    (num_windows_for): floor-256 division would drop scalar bits 247+,
    and the trimmed top window must still absorb the max carry.  The
    max-canonical scalar 2^253 - 1 pins both."""
    from webgpu_msm_bls12_377_tpu.models.cuzk import num_windows_for

    assert num_windows_for(13) == 20 and num_windows_for(14) == 19
    assert num_windows_for(15) == 17 and num_windows_for(16) == 16
    pts, scalars, expected = g1_case
    ks = list(scalars)
    ks[0] = (1 << 253) - 1
    from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

    want = crv.g1_to_affine(naive_msm(pts, ks, G1))
    aff = [crv.g1_to_affine(p) for p in pts]
    eng = CuzkMsmEngine(CurveId.BLS12_377, chunk_size=chunk)
    got = eng.compute_msm(aff, ks)
    assert (got["x"], got["y"]) == want


def test_input_validation():
    eng = CuzkMsmEngine(CurveId.BLS12_377)
    with pytest.raises(ValueError):
        eng.compute_msm([], [])
    x, y = crv.g1_to_affine(crv.G1_GENERATOR)
    with pytest.raises(ValueError):
        eng.compute_msm([(x, y)], [1, 2])
    # non-canonical wire scalar (>= 2^253) must raise, mirroring the CPU
    # oracle's final-carry error (reference/limbs.py:77), not silently
    # produce a wrong result through the signed decomposition
    with pytest.raises(ValueError, match="scalar out of range"):
        eng.compute_msm([(x, y)], [(1 << 256) - 1])
    with pytest.raises(ValueError, match="scalar out of range"):
        eng.compute_msm([(x, y)], [1 << 253])


def test_g1_batched_msm(g1_case):
    """Batched MSM over a fixed point set (BASELINE config 5)."""
    pts, scalars, expected = g1_case
    aff = [crv.g1_to_affine(p) for p in pts]
    rng2 = random.Random("batch2")
    scalars2 = [rng2.randrange(0, 1 << 253) for _ in range(N)]
    eng = CuzkMsmEngine(CurveId.BLS12_377)
    results = eng.compute_msm_batch(aff, [scalars, scalars2])
    assert (results[0]["x"], results[0]["y"]) == expected
    want2 = crv.g1_to_affine(naive_msm(pts, scalars2, G1))
    assert (results[1]["x"], results[1]["y"]) == want2


def test_pippenger_engine_both_curves(g1_case, ed_case):
    """The classic windowed bucket method as a standalone named engine
    (SURVEY §2 component 26 — the reference's Pippenger WebGPU engine)."""
    from webgpu_msm_bls12_377_tpu.models import PippengerMsmEngine

    pts, scalars, expected = g1_case
    eng = PippengerMsmEngine(CurveId.BLS12_377, chunk_size=4)
    assert eng.smvp_mode == "legacy"
    aff = [crv.g1_to_affine(p) for p in pts]
    got = eng.compute_msm(aff, scalars)
    assert (got["x"], got["y"]) == expected

    epts, escalars, eexpected = ed_case
    eeng = PippengerMsmEngine(CurveId.EDWARDS_BLS12, chunk_size=4)
    eaff = [crv.ed_to_affine(p) for p in epts]
    egot = eeng.compute_msm(eaff, escalars)
    assert (egot["x"], egot["y"]) == eexpected

    with pytest.raises(ValueError):
        PippengerMsmEngine(CurveId.BLS12_377, smvp_mode="stream")


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_prewarm_populates_cache():
    """prewarm compiles the size-class programs the real call then hits."""
    from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine
    from webgpu_msm_bls12_377_tpu.params import CurveId

    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=4, smvp_mode="stream-interpret",
        num_bpr_threads=8, stream_lanes=8,
    )
    n = 64
    t = eng.prewarm(n, 4, background=True)
    t.join()
    keys = [k for k in CuzkMsmEngine._compiled if k[1] in ("splan", "smain")]
    assert any(k[1] == "splan" and k[3] == n for k in keys)
    assert any(k[1] == "smain" and k[3] == n for k in keys)
    # a real MSM after prewarm must reuse the cached programs (no growth)
    rng = random.Random("prewarm")
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]
    aff = [crv.g1_to_affine(p) for p in pts]
    ks = [rng.randrange(0, 1 << 253) for _ in range(n)]
    before = len(CuzkMsmEngine._compiled)
    got = eng.compute_msm(aff, ks)
    want = crv.g1_to_affine(naive_msm(pts, ks, G1))
    assert (got["x"], got["y"]) == want
    assert len(CuzkMsmEngine._compiled) == before


@pytest.mark.slow  # interpret-mode hybrid compiles (see test_smvp_tree note)
def test_g1_batched_msm_tree_path(g1_case):
    """The tree-native batch split (shared tree table + per-set hybrid
    plans) against the oracle — the pipelined schedule bench.py --batch
    uses on TPU when auto resolves to the tree."""
    pts, scalars, expected = g1_case
    aff = [crv.g1_to_affine(p) for p in pts]
    rng2 = random.Random("batch3")
    scalars2 = [rng2.randrange(0, 1 << 253) for _ in range(N)]
    eng = CuzkMsmEngine(
        CurveId.BLS12_377, chunk_size=4, smvp_mode="tree-interpret",
        tree_finish=1, stream_lanes=8,
    )
    pw = eng._prepare_points(aff)
    sws = [eng._prepare_scalars(s) for s in (scalars, scalars2)]
    results = eng._msm_batch_tree(pw, sws, 4)
    assert (results[0]["x"], results[0]["y"]) == expected
    want2 = crv.g1_to_affine(naive_msm(pts, scalars2, G1))
    assert (results[1]["x"], results[1]["y"]) == want2
