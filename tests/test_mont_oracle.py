"""Montgomery / Barrett oracle tests.

Python mirror of src/submission/miscellaneous/tests/mont_mul.test.ts: all
three algorithm families over both fields at their supported word sizes,
plus the explicit overflow detector showing the carry-free algorithm breaks
at word sizes 14-15 (mont_mul.test.ts:446-459) and the negative test that
inputs >= p break the algorithm (mont_mul.test.ts:66-109).
"""

import pytest

pytestmark = pytest.mark.smoke

from webgpu_msm_bls12_377_tpu.params import (
    BLS12_377_BASE_FIELD,
    EDWARDS_BLS12_BASE_FIELD,
    CurveId,
    compute_misc_params,
    mont_params_for,
)
from webgpu_msm_bls12_377_tpu.reference.mont import (
    barrett_mul,
    mont_mul,
    mont_mul_cios,
    mont_mul_modified,
    mont_mul_optimised,
)
from webgpu_msm_bls12_377_tpu.reference.limbs import (
    from_words_le_unchecked,
    to_words_le,
)

FIELDS = [BLS12_377_BASE_FIELD, EDWARDS_BLS12_BASE_FIELD]


def _rand_pair(rng, p):
    return rng.randrange(p), rng.randrange(p)


@pytest.mark.parametrize("p", FIELDS)
@pytest.mark.parametrize("word_size", [12, 13])
def test_mont_optimised(rng, p, word_size):
    params = compute_misc_params(p, word_size)
    assert params.nsafe >= params.num_words
    for _ in range(20):
        x, y = _rand_pair(rng, p)
        xl = to_words_le(x, params.num_words, params.word_size)
        yl = to_words_le(y, params.num_words, params.word_size)
        out = from_words_le_unchecked(
            mont_mul_optimised(xl, yl, params), params.word_size
        )
        assert out == (x * y * params.rinv) % p


@pytest.mark.parametrize("p", FIELDS)
@pytest.mark.parametrize("word_size", [14, 15])
def test_mont_modified(rng, p, word_size):
    params = compute_misc_params(p, word_size)
    for _ in range(20):
        x, y = _rand_pair(rng, p)
        xl = to_words_le(x, params.num_words, params.word_size)
        yl = to_words_le(y, params.num_words, params.word_size)
        out = from_words_le_unchecked(
            mont_mul_modified(xl, yl, params), params.word_size
        )
        assert out == (x * y * params.rinv) % p


@pytest.mark.parametrize("p", FIELDS)
def test_mont_cios(rng, p):
    params = compute_misc_params(p, 16)
    for _ in range(20):
        x, y = _rand_pair(rng, p)
        xl = to_words_le(x, params.num_words, params.word_size)
        yl = to_words_le(y, params.num_words, params.word_size)
        out = from_words_le_unchecked(
            mont_mul_cios(xl, yl, params), params.word_size
        )
        assert out == (x * y * params.rinv) % p


def test_mont_optimised_overflow_at_w15(rng):
    """The carry-free algorithm must *fail* at word_size 15 for some input:
    this is the u32-overflow detector from mont_mul.test.ts:446-459. It
    proves the machine emulation is faithful (a pure-bigint model would
    pass)."""
    p = BLS12_377_BASE_FIELD
    params = compute_misc_params(p, 15)
    # nsafe < num_words, so carry-free accumulation overflows u32 eventually.
    assert params.nsafe < params.num_words
    failures = 0
    for x, y in [(p - 1, p - 1)] + [_rand_pair(rng, p) for _ in range(20)]:
        xl = to_words_le(x, params.num_words, params.word_size)
        yl = to_words_le(y, params.num_words, params.word_size)
        out = from_words_le_unchecked(
            mont_mul_optimised(xl, yl, params), params.word_size
        )
        if out != (x * y * params.rinv) % p:
            failures += 1
    assert failures > 0


def test_mont_rejects_unreduced_inputs(rng):
    """Inputs >= p are outside the algorithm's contract
    (mont_mul.test.ts:66-109)."""
    p = EDWARDS_BLS12_BASE_FIELD
    params = compute_misc_params(p, 13)
    # Fill the limb representation near its 2^260 capacity so the output of
    # the single conditional subtraction exceeds p.
    failures = 0
    for _ in range(20):
        x = rng.randrange(2**259, 2**260)
        y = rng.randrange(2**259, 2**260)
        out = mont_mul(x, y, params)
        if out != (x * y * params.rinv) % p:
            failures += 1
    assert failures > 0


@pytest.mark.parametrize("p", FIELDS)
def test_barrett_mul(rng, p):
    params = compute_misc_params(p, 13)
    for _ in range(20):
        x, y = _rand_pair(rng, p)
        assert barrett_mul(x, y, params) == (x * y) % p


def test_barrett_enters_montgomery_form(rng):
    """Stage 1 converts x -> x*r mod p via barrett field_mul(x, r)
    (convert_point_coords...wgsl:39-144)."""
    p = BLS12_377_BASE_FIELD
    params = compute_misc_params(p, 13)
    x = rng.randrange(p)
    assert barrett_mul(x, params.r, params) == params.to_mont(x)
    # and the montgomery route via r^2 gives the same result
    assert mont_mul(x, params.r2, params) == params.to_mont(x)


@pytest.mark.parametrize("curve", [CurveId.BLS12_377, CurveId.EDWARDS_BLS12])
def test_barrett_domb_mul(curve, rng):
    """Barrett-Domb benchmark variant (barrett_domb.template.wgsl:166-188)."""
    from webgpu_msm_bls12_377_tpu.reference.mont import barrett_domb_mul

    params = mont_params_for(curve)
    p = params.p
    cases = [(rng.randrange(p), rng.randrange(p)) for _ in range(32)]
    cases += [(0, p - 1), (1, p - 1), (p - 1, p - 1), (0, 0)]
    for x, y in cases:
        assert barrett_domb_mul(x, y, params) == (x * y) % p
