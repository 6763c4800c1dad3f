"""Plain-bigint elliptic curve oracles for BLS12-377 G1 and Edwards BLS12.

The formulas mirror the reference's device code exactly so that the JAX
kernels can be differentially tested limb-for-limb:

- Short Weierstrass projective add: "add-2002-bj" unified formula, 16M
  (src/submission/implementation/wgsl/curve/ec_bls12_377.template.wgsl:13-52)
- Short Weierstrass projective double: "dbl-2007-bl", 10M
  (ec_bls12_377.template.wgsl:55-80)
- Twisted Edwards extended add/double: unified 2008-hwcd formulas, the same
  family used by @noble/curves' ExtendedPoint in the reference's FieldMath
  oracle (src/reference/utils/FieldMath.ts:104-137).

Points here live in the *plain* field domain; the identical formulas run in
the Montgomery domain on-device (Montgomery product is multiplicative-
homomorphic: mont(aR, bR) = abR).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..params import (
    BLS12_377_BASE_FIELD,
    BLS12_377_G1_GENERATOR_X,
    BLS12_377_G1_GENERATOR_Y,
    EDWARDS_A,
    EDWARDS_BLS12_BASE_FIELD,
    EDWARDS_D,
    EDWARDS_GENERATOR_X,
    EDWARDS_GENERATOR_Y,
)

# ---------------------------------------------------------------------------
# Short Weierstrass (BLS12-377 G1): y^2 = x^3 + 1 over the 377-bit field
# ---------------------------------------------------------------------------

P = BLS12_377_BASE_FIELD


@dataclass(frozen=True)
class ProjectivePoint:
    """(X : Y : Z) projective point; the zero point has Z == 0."""

    x: int
    y: int
    z: int

    def is_zero(self) -> bool:
        return self.z % P == 0


G1_ZERO = ProjectivePoint(0, 1, 0)
G1_GENERATOR = ProjectivePoint(BLS12_377_G1_GENERATOR_X, BLS12_377_G1_GENERATOR_Y, 1)


def g1_from_affine(x: int, y: int) -> ProjectivePoint:
    return ProjectivePoint(x % P, y % P, 1)


def g1_on_curve(pt: ProjectivePoint) -> bool:
    """Projective check Y^2 Z = X^3 + Z^3 (b = 1, a = 0)."""
    x, y, z = pt.x % P, pt.y % P, pt.z % P
    return (y * y * z - (x * x * x + z * z * z)) % P == 0


def g1_neg(pt: ProjectivePoint) -> ProjectivePoint:
    """Point negation (y -> p - y). Mirrors bls12_377.ts:64-69."""
    if pt.is_zero():
        return pt
    return ProjectivePoint(pt.x, (-pt.y) % P, pt.z)


def g1_add(p1: ProjectivePoint, p2: ProjectivePoint) -> ProjectivePoint:
    """Unified projective addition, add-2002-bj (16M 5add 4sub).

    Line-for-line mirror of ec_bls12_377.template.wgsl:13-52 including the
    point-at-infinity early returns.
    """
    if p1.is_zero():
        return p2
    if p2.is_zero():
        return p1
    x1, y1, z1 = p1.x, p1.y, p1.z
    x2, y2, z2 = p2.x, p2.y, p2.z

    u1 = (x1 * z2) % P
    u2 = (x2 * z1) % P
    s1 = (y1 * z2) % P
    s2 = (y2 * z1) % P
    zz = (z1 * z2) % P
    t = (u1 + u2) % P
    m = (s1 + s2) % P
    u1u2 = (u1 * u2) % P
    tt = (t * t) % P
    r = (tt - u1u2) % P  # a == 0 so no a*ZZ^2 term
    f = (zz * m) % P
    l = (m * f) % P
    g = (t * l) % P
    rr = (r * r) % P
    w = (rr - g) % P
    fw = (f * w) % P
    x3 = (fw + fw) % P
    w2 = (w + w) % P
    gw2 = (g - w2) % P
    rgw2 = (r * gw2) % P
    ll = (l * l) % P
    y3 = (rgw2 - ll) % P
    ff = (f * f) % P
    fff = (ff * f) % P
    z3 = (fff + fff) % P
    return ProjectivePoint(x3, y3, z3)


def g1_double(p1: ProjectivePoint) -> ProjectivePoint:
    """Projective doubling, dbl-2007-bl (10M), a == 0.

    Mirror of ec_bls12_377.template.wgsl:55-80.
    """
    x, y, z = p1.x, p1.y, p1.z
    xx = (x * x) % P
    w = (xx + xx + xx) % P
    y1z1 = (y * z) % P
    s = (y1z1 + y1z1) % P
    ss = (s * s) % P
    sss = (ss * s) % P
    r = (y * s) % P
    rr = (r * r) % P
    x1r = (x + r) % P
    x1rx1r = (x1r * x1r) % P
    b = (x1rx1r - xx - rr) % P
    ww = (w * w) % P
    h = (ww - (b + b)) % P
    x3 = (h * s) % P
    y3 = ((w * ((b - h) % P)) - (rr + rr)) % P
    return ProjectivePoint(x3, y3, sss)


def g1_add_rcb(p1: ProjectivePoint, p2: ProjectivePoint) -> ProjectivePoint:
    """Complete projective addition (Renes-Costello-Batina 2016, Alg. 7,
    a = 0, b3 = 3b = 3).

    Exception-free on prime-order inputs: identity, doubling and inverse
    cases all flow through the same straight-line code — the formula family
    the TPU kernels use (no lane selects needed).  12M + 2 small-constant
    muls.
    """
    X1, Y1, Z1 = p1.x % P, p1.y % P, p1.z % P
    X2, Y2, Z2 = p2.x % P, p2.y % P, p2.z % P
    b3 = 3
    t0 = X1 * X2 % P; t1 = Y1 * Y2 % P; t2 = Z1 * Z2 % P
    t3 = (X1 + Y1) % P; t4 = (X2 + Y2) % P; t3 = t3 * t4 % P
    t4 = (t0 + t1) % P; t3 = (t3 - t4) % P; t4 = (Y1 + Z1) % P
    X3 = (Y2 + Z2) % P; t4 = t4 * X3 % P; X3 = (t1 + t2) % P
    t4 = (t4 - X3) % P; X3 = (X1 + Z1) % P; Y3 = (X2 + Z2) % P
    X3 = X3 * Y3 % P; Y3 = (t0 + t2) % P; Y3 = (X3 - Y3) % P
    X3 = (t0 + t0) % P; t0 = (X3 + t0) % P; t2 = b3 * t2 % P
    Z3 = (t1 + t2) % P; t1 = (t1 - t2) % P; Y3 = b3 * Y3 % P
    X3 = t4 * Y3 % P; t2 = t3 * t1 % P; X3 = (t2 - X3) % P
    Y3 = Y3 * t0 % P; t1 = t1 * Z3 % P; Y3 = (t1 + Y3) % P
    t0 = t0 * t3 % P; Z3 = Z3 * t4 % P; Z3 = (Z3 + t0) % P
    return ProjectivePoint(X3, Y3, Z3)


def g1_add_mixed_rcb(
    p1: ProjectivePoint, q: tuple[int, int]
) -> ProjectivePoint:
    """Complete mixed addition (RCB 2016, Alg. 8, a = 0, b3 = 3): 11M.

    q is an affine (x, y) point (must not be the identity; the projective
    accumulator p1 may be anything, including the identity)."""
    X1, Y1, Z1 = p1.x % P, p1.y % P, p1.z % P
    X2, Y2 = q[0] % P, q[1] % P
    b3 = 3
    t0 = X1 * X2 % P; t1 = Y1 * Y2 % P; t3 = (X2 + Y2) % P
    t4 = (X1 + Y1) % P; t3 = t3 * t4 % P; t4 = (t0 + t1) % P
    t3 = (t3 - t4) % P; t4 = Y2 * Z1 % P; t4 = (t4 + Y1) % P
    Y3 = X2 * Z1 % P; Y3 = (Y3 + X1) % P; X3 = (t0 + t0) % P
    t0 = (X3 + t0) % P; t2 = b3 * Z1 % P; Z3 = (t1 + t2) % P
    t1 = (t1 - t2) % P; Y3 = b3 * Y3 % P; X3 = t4 * Y3 % P
    t2 = t3 * t1 % P; X3 = (t2 - X3) % P; Y3 = Y3 * t0 % P
    t1 = t1 * Z3 % P; Y3 = (t1 + Y3) % P; t0 = t0 * t3 % P
    Z3 = Z3 * t4 % P; Z3 = (Z3 + t0) % P
    return ProjectivePoint(X3, Y3, Z3)


def g1_double_rcb(p: ProjectivePoint) -> ProjectivePoint:
    """Complete doubling (RCB 2016, Alg. 9, a = 0, b3 = 3): 8M."""
    X, Y, Z = p.x % P, p.y % P, p.z % P
    b3 = 3
    t0 = Y * Y % P; Z3 = (t0 + t0) % P; Z3 = (Z3 + Z3) % P
    Z3 = (Z3 + Z3) % P; t1 = Y * Z % P; t2 = Z * Z % P
    t2 = b3 * t2 % P; X3 = t2 * Z3 % P; Y3 = (t0 + t2) % P
    Z3 = t1 * Z3 % P; t1 = (t2 + t2) % P; t2 = (t1 + t2) % P
    t0 = (t0 - t2) % P; Y3 = t0 * Y3 % P; Y3 = (X3 + Y3) % P
    t1 = X * Y % P; X3 = t0 * t1 % P; X3 = (X3 + X3) % P
    return ProjectivePoint(X3, Y3, Z3)


def g1_scalar_mult(pt: ProjectivePoint, k: int) -> ProjectivePoint:
    """Double-and-add scalar multiplication (bls12_377.ts:71-73)."""
    if k < 0:
        return g1_scalar_mult(g1_neg(pt), -k)
    result = G1_ZERO
    addend = pt
    while k:
        if k & 1:
            result = g1_add(result, addend)
        addend = g1_double(addend)
        k >>= 1
    return result


def g1_to_affine(pt: ProjectivePoint) -> tuple[int, int]:
    """(X:Y:Z) -> (x, y) via Z-inverse (bls12_377.ts:41-60)."""
    if pt.is_zero():
        return (0, 1)  # affine encoding of the zero point used by the harness
    zinv = pow(pt.z % P, P - 2, P)
    return ((pt.x * zinv) % P, (pt.y * zinv) % P)


def g1_eq(p1: ProjectivePoint, p2: ProjectivePoint) -> bool:
    if p1.is_zero() or p2.is_zero():
        return p1.is_zero() and p2.is_zero()
    return (
        (p1.x * p2.z - p2.x * p1.z) % P == 0
        and (p1.y * p2.z - p2.y * p1.z) % P == 0
    )


# ---------------------------------------------------------------------------
# Twisted Edwards (Edwards BLS12): a*x^2 + y^2 = 1 + d*x^2*y^2,
# a = -1, d = 3021 over the 253-bit field
# ---------------------------------------------------------------------------

Q = EDWARDS_BLS12_BASE_FIELD


@dataclass(frozen=True)
class ExtendedPoint:
    """Extended twisted Edwards coordinates (X : Y : T : Z), T = XY/Z."""

    x: int
    y: int
    t: int
    z: int


ED_ZERO = ExtendedPoint(0, 1, 0, 1)
ED_GENERATOR = ExtendedPoint(
    EDWARDS_GENERATOR_X,
    EDWARDS_GENERATOR_Y,
    (EDWARDS_GENERATOR_X * EDWARDS_GENERATOR_Y) % Q,
    1,
)


def ed_from_affine(x: int, y: int) -> ExtendedPoint:
    return ExtendedPoint(x % Q, y % Q, (x * y) % Q, 1)


def ed_on_curve(pt: ExtendedPoint) -> bool:
    """Check a x^2 + y^2 = 1 + d x^2 y^2 on the affine image."""
    x, y = ed_to_affine(pt)
    return (EDWARDS_A * x * x + y * y - 1 - EDWARDS_D * x * x * y * y) % Q == 0


def ed_neg(pt: ExtendedPoint) -> ExtendedPoint:
    return ExtendedPoint((-pt.x) % Q, pt.y, (-pt.t) % Q, pt.z)


def ed_add(p1: ExtendedPoint, p2: ExtendedPoint) -> ExtendedPoint:
    """Unified extended addition, add-2008-hwcd (9M), complete for a = -1.

    Same formula family as @noble/curves ExtendedPoint.add used by the
    reference oracle (FieldMath.ts:61-65). Branch-free: safe to run on
    identical, inverse, and identity inputs.
    """
    a = (p1.x * p2.x) % Q
    b = (p1.y * p2.y) % Q
    c = (EDWARDS_D * p1.t * p2.t) % Q
    d = (p1.z * p2.z) % Q
    e = ((p1.x + p1.y) * (p2.x + p2.y) - a - b) % Q
    f = (d - c) % Q
    g = (d + c) % Q
    h = (b - EDWARDS_A * a) % Q
    return ExtendedPoint((e * f) % Q, (g * h) % Q, (e * h) % Q, (f * g) % Q)


def ed_double(p1: ExtendedPoint) -> ExtendedPoint:
    """Extended doubling, dbl-2008-hwcd (4M 4S)."""
    a = (p1.x * p1.x) % Q
    b = (p1.y * p1.y) % Q
    c = (2 * p1.z * p1.z) % Q
    d = (EDWARDS_A * a) % Q
    e = ((p1.x + p1.y) * (p1.x + p1.y) - a - b) % Q
    g = (d + b) % Q
    f = (g - c) % Q
    h = (d - b) % Q
    return ExtendedPoint((e * f) % Q, (g * h) % Q, (e * h) % Q, (f * g) % Q)


def ed_scalar_mult(pt: ExtendedPoint, k: int) -> ExtendedPoint:
    if k < 0:
        return ed_scalar_mult(ed_neg(pt), -k)
    result = ED_ZERO
    addend = pt
    while k:
        if k & 1:
            result = ed_add(result, addend)
        addend = ed_double(addend)
        k >>= 1
    return result


def ed_to_affine(pt: ExtendedPoint) -> tuple[int, int]:
    zinv = pow(pt.z % Q, Q - 2, Q)
    return ((pt.x * zinv) % Q, (pt.y * zinv) % Q)


def ed_eq(p1: ExtendedPoint, p2: ExtendedPoint) -> bool:
    return (
        (p1.x * p2.z - p2.x * p1.z) % Q == 0
        and (p1.y * p2.z - p2.y * p1.z) % Q == 0
    )


def ed_get_point_from_x(x: int) -> tuple[int, int]:
    """Recover (x, y) on the prime-order subgroup from an x coordinate.

    Mirrors FieldMath.getPointFromX (FieldMath.ts:31-55): solve
    y^2 = (a x^2 - 1) / (d x^2 - 1), then pick the root whose point lies in
    the subgroup (multiplying by the subgroup characteristic yields the
    identity).
    """
    from ..params import EDWARDS_SUBGROUP_CHARACTERISTIC
    from .field import finv, fsqrt

    x %= Q
    x2 = (x * x) % Q
    num = (EDWARDS_A * x2 - 1) % Q
    den = (EDWARDS_D * x2 - 1) % Q
    y2 = (num * finv(den, Q)) % Q
    y = fsqrt(y2, Q)
    if y is None:
        raise ValueError("x is not on the curve")
    cand = ed_from_affine(x, y)
    mult = ed_scalar_mult(cand, EDWARDS_SUBGROUP_CHARACTERISTIC)
    ax, ay = ed_to_affine(mult)
    if ax == 0 and ay == 1:
        return (x, y)
    return (x, (-y) % Q)
