"""MSM oracle tests: the miniature full-pipeline test from
src/submission/miscellaneous/tests/cuzk.test.ts (n=16, s=4), scaled variants,
and cross-checks between naive / Pippenger / cuZK models on both curves."""

import pytest

pytestmark = pytest.mark.smoke

from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.limbs import (
    decompose_scalars_signed,
)
from webgpu_msm_bls12_377_tpu.reference.msm import (
    EDWARDS,
    G1,
    cpu_smtvp,
    cpu_smvp_signed,
    cpu_transpose,
    cuzk_msm,
    horner,
    naive_msm,
    parallel_bucket_reduction_1,
    parallel_bucket_reduction_2,
    pippenger_msm,
    running_sum_bucket_reduction,
)


def _g1_points(rng, n):
    return [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 2**64))
        for _ in range(n)
    ]


def _ed_points(rng, n):
    return [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 2**64))
        for _ in range(n)
    ]


def test_decompose_signed_roundtrip(rng):
    """Signed digits reconstruct the scalar: sum (d_i) * 2^(i*s) with the
    stored shift removed (utils.ts:66-109)."""
    s = 16
    num = 16
    scalars = [rng.randrange(2**253) % (2**253) for _ in range(20)]
    # keep scalars under the scalar field so the final carry is 0
    from webgpu_msm_bls12_377_tpu.params import SCALAR_FIELD

    scalars = [x % SCALAR_FIELD for x in scalars]
    windows = decompose_scalars_signed(scalars, num, s)
    shift = 1 << (s - 1)
    for j, scalar in enumerate(scalars):
        val = 0
        for i in range(num):
            val += (windows[i][j] - shift) << (i * s)
        assert val == scalar


def test_cuzk_miniature_n16_s4(rng):
    """The n=16, chunk_size=4 whole-pipeline test (cuzk.test.ts:83-113)."""
    n, s = 16, 4
    points = _g1_points(rng, n)
    scalars = [rng.randrange(2**253 - 2**29) for _ in range(n)]

    expected = naive_msm(points, scalars, G1)
    got = cuzk_msm(points, scalars, chunk_size=s, group=G1)
    assert crv.g1_eq(got, expected)


def test_cuzk_stage_cross_check(rng):
    """Cross-check the three bucket-reduction algorithms against each other
    (cuzk.test.ts:83-92)."""
    n, s = 16, 4
    num_columns = 1 << s
    num_subtasks = -(-256 // s)
    points = _g1_points(rng, n)
    scalars = [rng.randrange(2**250) for _ in range(n)]

    decomposed = decompose_scalars_signed(scalars, num_subtasks, s)
    all_csr_col_idx = [d for window in decomposed for d in window]
    all_csc_col_ptr, _, all_csc_vals = cpu_transpose(
        all_csr_col_idx, num_columns, -(-n // num_columns), num_subtasks, n
    )

    for subtask_idx in (0, 1, num_subtasks - 1):
        buckets = cpu_smvp_signed(
            subtask_idx, n, num_columns, all_csc_col_ptr, all_csc_vals, points, G1
        )
        serial = running_sum_bucket_reduction(buckets, G1)
        g_pts, m_pts = parallel_bucket_reduction_1(buckets, 4, G1)
        reduced = parallel_bucket_reduction_2(g_pts, m_pts, len(buckets), 4, G1)
        acc = G1.zero
        for pt in reduced:
            acc = G1.add(acc, pt)
        assert crv.g1_eq(serial, acc)


@pytest.mark.slow  # suite budget: covered in the slow tier (round 5)
def test_pippenger_matches_naive_g1(rng):
    n = 12
    points = _g1_points(rng, n)
    scalars = [rng.randrange(2**253 - 2**29) for _ in range(n)]
    assert crv.g1_eq(
        pippenger_msm(points, scalars, chunk_size=16, group=G1),
        naive_msm(points, scalars, G1),
    )


def test_cuzk_matches_naive_edwards(rng):
    n, s = 16, 4
    points = _ed_points(rng, n)
    scalars = [rng.randrange(2**250) for _ in range(n)]
    assert crv.ed_eq(
        cuzk_msm(points, scalars, chunk_size=s, group=EDWARDS),
        naive_msm(points, scalars, EDWARDS),
    )


def test_horner(rng):
    s = 8
    sums = [crv.g1_scalar_mult(crv.G1_GENERATOR, k) for k in (3, 5, 7)]
    got = horner(sums, s, G1)
    expected_scalar = 3 + 5 * 2**s + 7 * 2 ** (2 * s)
    assert crv.g1_eq(got, crv.g1_scalar_mult(crv.G1_GENERATOR, expected_scalar))


@pytest.mark.parametrize("edge_scalars", [
    [0, 0, 0, 0],
    [1, 0, 0, 0],
    [0, 1, 2, 3],
])
def test_cuzk_edge_scalars(rng, edge_scalars):
    """Zero scalars and tiny scalars exercise the empty-bucket paths."""
    points = _g1_points(rng, len(edge_scalars))
    expected = naive_msm(points, edge_scalars, G1)
    got = cuzk_msm(points, edge_scalars, chunk_size=4, group=G1)
    assert crv.g1_eq(got, expected)


def test_cuzk_scalar_field_boundary(rng):
    """Scalars near the scalar-field modulus exercise the signed-digit carry
    chain all the way to the top window (utils.ts:95-98)."""
    from webgpu_msm_bls12_377_tpu.params import SCALAR_FIELD

    points = _g1_points(rng, 4)
    scalars = [SCALAR_FIELD - 1, SCALAR_FIELD - 2, 2**252 + 1, 2**252 - 1]
    expected = naive_msm(points, scalars, G1)
    got = cuzk_msm(points, scalars, chunk_size=16, group=G1)
    assert crv.g1_eq(got, expected)


def test_smtvp_matches_column_grouping(rng):
    """The exploratory SMTVP model (smtvp.template.wgsl:43-59): bucket
    accumulation via a transpose-free CSR walk with an all-ones vector
    must equal direct per-column grouping (SURVEY #22)."""
    m, n_cols, nnz_per_row = 4, 8, 3
    points = _g1_points(rng, m * nnz_per_row)
    row_ptr = [i * nnz_per_row for i in range(m + 1)]
    col_idx = [rng.randrange(n_cols) for _ in range(m * nnz_per_row)]
    got = cpu_smtvp(row_ptr, col_idx, points, n_cols, G1)
    for c in range(n_cols):
        want = G1.zero
        for j, cj in enumerate(col_idx):
            if cj == c:
                want = G1.add(want, points[j])
        assert crv.g1_eq(got[c], want), f"col {c}"
