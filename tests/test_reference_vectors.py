"""Bit-exact check against the reference's PUBLISHED test vectors.

The reference hardcodes expected affine results for its 2^16..2^20
BLS12-377 cases (src/test-data/testCases.ts:11-32) but stores the
point/scalar payloads in git LFS, which is not available in this
environment.  The expectations are vendored
(harness/testdata.py:REFERENCE_EXPECTED); when the payload files are
dropped under test-data/reference/ (either the reference's
points/ + scalars/ layout or flat), the full bit-exact run activates.
Without them, the structural pieces (constants on-curve, loader format
round-trip) still run.
"""

import json
import os

import pytest

from webgpu_msm_bls12_377_tpu.harness import testdata
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as crv


def test_vendored_expected_results_are_on_curve():
    """The 5 vendored (x, y) pairs are valid affine G1 points."""
    p = crv.P
    b = 1
    for power, (x, y) in testdata.REFERENCE_EXPECTED.items():
        assert 0 < x < p and 0 < y < p, power
        assert (y * y - (x * x * x + b)) % p == 0, power


def test_reference_loader_format_roundtrip(tmp_path):
    """load_reference_test_case parses the reference's exact text
    formats (saveTestCaseToFile.ts / loadTestCase)."""
    pts_dir = tmp_path / "points"
    sc_dir = tmp_path / "scalars"
    pts_dir.mkdir()
    sc_dir.mkdir()
    g = crv.g1_to_affine(crv.G1_GENERATOR)
    h = crv.g1_to_affine(crv.g1_double(crv.G1_GENERATOR))
    with open(pts_dir / "16-power-points.txt", "w") as f:
        for x, y in (g, h):
            f.write(
                json.dumps({"x": str(x), "y": str(y), "z": "1"}) + "\n"
            )
    with open(sc_dir / "16-power-scalars.txt", "w") as f:
        f.write('"3",\n"5",\n')  # saveScalarsToFile quotes + trailing comma
    case = testdata.load_reference_test_case(16, str(tmp_path))
    assert case.points == [g, h]
    assert case.scalars == [3, 5]
    assert case.expected == testdata.REFERENCE_EXPECTED[16]


@pytest.mark.parametrize("power", [16, 17, 18, 19, 20])
def test_reference_vectors_bit_exact(power):
    """Full bit-exact MSM vs the reference's published results — runs
    only when the LFS payloads have been provided locally."""
    try:
        case = testdata.load_reference_test_case(power)
    except FileNotFoundError:
        pytest.skip(
            "reference LFS fixtures not vendored (drop the reference "
            "repo's test-data/points + test-data/scalars files under "
            "test-data/reference/ to activate)"
        )
    from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine

    eng = CuzkMsmEngine(CurveId.BLS12_377)
    got = eng.compute_msm(case.points, case.scalars)
    assert (got["x"], got["y"]) == case.expected
