"""Harness layer: test-data round-trip and on-device point generation."""

import os

import pytest

from webgpu_msm_bls12_377_tpu.harness import testdata
from webgpu_msm_bls12_377_tpu.models.naive import NaiveMsmEngine  # noqa: F401
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv


@pytest.mark.slow  # ~30 s host bigint scalar-mults (suite budget);
# the Edwards variant keeps the generation path covered by default
def test_generate_points_on_curve():
    pts = testdata.generate_points(CurveId.BLS12_377, 8, seed="t1")
    assert len(pts) == 8
    for x, y in pts:
        assert crv.g1_on_curve(crv.g1_from_affine(x, y))
    # deterministic per seed, distinct points
    again = testdata.generate_points(CurveId.BLS12_377, 8, seed="t1")
    assert pts == again
    assert len(set(pts)) == len(pts)


def test_generate_points_edwards():
    pts = testdata.generate_points(CurveId.EDWARDS_BLS12, 8, seed="t2")
    for x, y in pts:
        assert crv.ed_on_curve(crv.ed_from_affine(x, y))


def test_save_load_round_trip(tmp_path):
    case = testdata.TestCase(
        curve=CurveId.BLS12_377,
        points=[(1, 2), (3, 4)],
        scalars=[5, 6],
        expected=(7, 8),
    )
    testdata.save_test_case(case, str(tmp_path))
    loaded = testdata.load_test_case(CurveId.BLS12_377, 1, str(tmp_path))
    assert loaded.points == case.points
    assert loaded.scalars == case.scalars
    assert loaded.expected == case.expected


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_naive_engine_matches_oracle(rng):
    """The baseline double-and-add engine against the bigint oracle."""
    import jax.numpy as jnp
    import numpy as np
    import jax

    from webgpu_msm_bls12_377_tpu.models.naive import NaiveMsmEngine
    from webgpu_msm_bls12_377_tpu.ops.convert import ints_to_words
    from webgpu_msm_bls12_377_tpu.reference.limbs import (
        from_words_le_unchecked,
    )
    from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

    n = 8
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]
    aff = [crv.g1_to_affine(p) for p in pts]
    ks = [rng.randrange(0, 1 << 253) for _ in range(n)]
    eng = NaiveMsmEngine(CurveId.BLS12_377)
    pw = np.stack(
        [
            ints_to_words([a[0] for a in aff], 12),
            ints_to_words([a[1] for a in aff], 12),
        ]
    )
    sw = np.asarray(ints_to_words(ks, 8))
    coords = jax.jit(eng.build_fn())(jnp.asarray(pw), jnp.asarray(sw))
    w = eng.ctx.word_size
    vals = [
        from_words_le_unchecked(np.asarray(c)[:, 0].tolist(), w)
        for c in coords
    ]
    got = crv.ProjectivePoint(*vals)
    want = naive_msm(pts, ks, G1)
    assert crv.g1_eq(got, want)


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_zipf_case_matches_oracle(tmp_path):
    """Duplicate-heavy (zipf-pool) bench case: expected result via the
    known-k identity must equal the naive oracle MSM (reference
    analogue: the preaggregation cluster regime,
    miscellaneous/wgsl/preaggregation_stage_1/2)."""
    from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

    case = testdata.make_zipf_case(
        CurveId.BLS12_377, 6, pool_bits=3, cache_dir=str(tmp_path)
    )
    n = case.point_words.shape[-1]

    def col_int(w, j):
        return sum(int(w[i, j]) << (32 * i) for i in range(w.shape[0]))

    pts = [
        crv.g1_from_affine(
            col_int(case.point_words[0], j), col_int(case.point_words[1], j)
        )
        for j in range(n)
    ]
    scalars = [col_int(case.scalar_words, j) for j in range(n)]
    # the pool really does collide: far fewer distinct scalars than n
    assert len(set(scalars)) <= 1 << 3
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert want == case.expected
