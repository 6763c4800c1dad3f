"""Parameter-derivation tests, mirroring the constant checks implicit in
src/submission/implementation/cuzk/utils.ts:452-533 and README.md:386-396."""

import pytest

pytestmark = pytest.mark.smoke

from webgpu_msm_bls12_377_tpu.params import (
    BLS12_377_BASE_FIELD,
    BLS12_377_PARAMS,
    EDWARDS_BLS12_BASE_FIELD,
    EDWARDS_PARAMS,
    compute_misc_params,
)


def test_field_widths():
    assert BLS12_377_BASE_FIELD.bit_length() == 377
    assert EDWARDS_BLS12_BASE_FIELD.bit_length() == 253


def test_bls12_377_limb_parameters():
    # README.md:283-285 - 30 words of 13 bits for the 377-bit field
    p = BLS12_377_PARAMS
    assert p.word_size == 13
    assert p.num_words == 30
    assert p.nsafe == 32  # README.md:388-396, w=13 row
    assert p.nsafe >= p.num_words  # carry-free inner loop is safe
    assert p.slack == 30 * 13 - 377 == 13


def test_edwards_limb_parameters():
    p = EDWARDS_PARAMS
    assert p.word_size == 13
    assert p.num_words == 20
    assert p.nsafe == 32


def test_montgomery_constants_bls12_377():
    p = BLS12_377_PARAMS
    r_full = 2 ** (p.num_words * p.word_size)
    assert (r_full * p.rinv) % p.p == 1
    assert p.r == r_full % p.p
    assert p.r2 == (r_full * r_full) % p.p
    # n0 = -p^-1 mod 2^w
    assert (p.n0 * p.p) % (1 << p.word_size) == (1 << p.word_size) - 1 or (
        p.n0 * p.p + 1
    ) % (1 << p.word_size) == 0


def test_mont_roundtrip():
    for params in (BLS12_377_PARAMS, EDWARDS_PARAMS):
        x = 0x123456789ABCDEF % params.p
        assert params.from_mont(params.to_mont(x)) == x


def test_num_words_matches_reference_table():
    # README.md:388-396 table for the 253-bit field and calc_num_words'
    # special case for (377, 15) (utils.ts:441-443)
    assert compute_misc_params(EDWARDS_BLS12_BASE_FIELD, 13).num_words == 20
    assert compute_misc_params(BLS12_377_BASE_FIELD, 16).num_words == 24
    assert compute_misc_params(BLS12_377_BASE_FIELD, 15).num_words == 27


def test_barrett_mu():
    p = BLS12_377_PARAMS
    # mu = floor(4^x / p) for the smallest x with 2^x > p (utils.ts:354-369)
    x = 377
    assert 2**x > p.p and 2 ** (x - 1) < p.p
    assert p.mu == 4**x // p.p
