"""Curve oracle tests, mirroring bls12_377.test.ts and FieldMath.test.ts."""

import pytest

pytestmark = pytest.mark.smoke

from webgpu_msm_bls12_377_tpu.params import (
    BLS12_377_BASE_FIELD as P,
    EDWARDS_SUBGROUP_CHARACTERISTIC,
)
from webgpu_msm_bls12_377_tpu.reference import curve as crv


class TestG1:
    def test_generator_on_curve(self):
        assert crv.g1_on_curve(crv.G1_GENERATOR)

    def test_add_vs_double(self):
        g = crv.G1_GENERATOR
        assert crv.g1_eq(crv.g1_add(g, g), crv.g1_double(g))

    def test_add_zero(self):
        g = crv.G1_GENERATOR
        assert crv.g1_eq(crv.g1_add(g, crv.G1_ZERO), g)
        assert crv.g1_eq(crv.g1_add(crv.G1_ZERO, g), g)

    def test_add_neg_is_zero(self):
        g = crv.G1_GENERATOR
        s = crv.g1_add(g, crv.g1_neg(g))
        assert s.is_zero()

    def test_scalar_mult_matches_repeated_add(self):
        g = crv.G1_GENERATOR
        acc = crv.G1_ZERO
        for k in range(8):
            assert crv.g1_eq(crv.g1_scalar_mult(g, k), acc)
            assert crv.g1_on_curve(acc)
            acc = crv.g1_add(acc, g)

    def test_associativity(self):
        g = crv.G1_GENERATOR
        a = crv.g1_scalar_mult(g, 0x1234)
        b = crv.g1_scalar_mult(g, 0x5678)
        c = crv.g1_scalar_mult(g, 0x9ABC)
        lhs = crv.g1_add(crv.g1_add(a, b), c)
        rhs = crv.g1_add(a, crv.g1_add(b, c))
        assert crv.g1_eq(lhs, rhs)

    def test_to_affine_roundtrip(self):
        g2 = crv.g1_double(crv.G1_GENERATOR)
        x, y = crv.g1_to_affine(g2)
        assert crv.g1_eq(crv.g1_from_affine(x, y), g2)
        # projective -> affine of the generator itself is the identity map
        gx, gy = crv.g1_to_affine(crv.G1_GENERATOR)
        assert gx == crv.G1_GENERATOR.x and gy == crv.G1_GENERATOR.y

    def test_negate_matches_field_negation(self):
        # bls12_377.test.ts:19-35 - negation is y -> p - y
        g = crv.G1_GENERATOR
        n = crv.g1_neg(g)
        assert n.y == (P - g.y) % P
        assert crv.g1_on_curve(n)


class TestEdwards:
    def test_generator_on_curve(self):
        assert crv.ed_on_curve(crv.ED_GENERATOR)

    def test_add_vs_double(self):
        g = crv.ED_GENERATOR
        assert crv.ed_eq(crv.ed_add(g, g), crv.ed_double(g))

    def test_identity(self):
        g = crv.ED_GENERATOR
        assert crv.ed_eq(crv.ed_add(g, crv.ED_ZERO), g)
        s = crv.ed_add(g, crv.ed_neg(g))
        assert crv.ed_eq(s, crv.ED_ZERO)

    def test_scalar_mult(self):
        g = crv.ED_GENERATOR
        acc = crv.ED_ZERO
        for k in range(8):
            assert crv.ed_eq(crv.ed_scalar_mult(g, k), acc)
            assert crv.ed_on_curve(acc)
            acc = crv.ed_add(acc, g)

    def test_generator_in_subgroup(self):
        # the subgroup characteristic annihilates the generator
        # (FieldMath.ts:46-49)
        s = crv.ed_scalar_mult(crv.ED_GENERATOR, EDWARDS_SUBGROUP_CHARACTERISTIC)
        assert crv.ed_eq(s, crv.ED_ZERO)

    def test_get_point_from_x(self):
        # FieldMath.test.ts:4-99 equivalent: recover y from x for the
        # generator and check subgroup membership
        x, y = crv.ed_get_point_from_x(crv.ED_GENERATOR.x)
        assert x == crv.ED_GENERATOR.x
        assert y == crv.ED_GENERATOR.y


@pytest.mark.parametrize("k", [3, 255, 65537])
def test_cross_formula_consistency_g1(k):
    """n*G via double-and-add equals (n-1)*G + G via the unified add."""
    g = crv.G1_GENERATOR
    a = crv.g1_scalar_mult(g, k)
    b = crv.g1_add(crv.g1_scalar_mult(g, k - 1), g)
    assert crv.g1_eq(a, b)
