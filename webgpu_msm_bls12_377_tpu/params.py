"""Field / curve constants and Montgomery-arithmetic parameter derivation.

Mirrors the parameterization of the reference implementation:
- field moduli: src/submission/implementation/cuzk/bls12_377.ts:9-19 and
  src/reference/utils/FieldMath.ts:7-10
- limb/Montgomery/Barrett parameter math:
  src/submission/implementation/cuzk/utils.ts:435-533

All big integers here are plain Python ints; device-side limb forms are
derived from these in ops/limbs.py.
"""

from __future__ import annotations

import dataclasses
import enum
from functools import lru_cache

# ---------------------------------------------------------------------------
# Curve / field constants
# ---------------------------------------------------------------------------

#: BLS12-377 G1 base field modulus (377 bits).
#: Reference: src/submission/implementation/cuzk/bls12_377.ts:10-12
BLS12_377_BASE_FIELD = int(
    "0x01ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba0948001"
    "70b5d44300000008508c00000000001",
    16,
)

#: BLS12-377 scalar field == Edwards BLS12 ("Aleo") base field (253 bits).
#: Reference: src/submission/implementation/cuzk/bls12_377.ts:13-15 and
#: src/reference/utils/FieldMath.ts:7
EDWARDS_BLS12_BASE_FIELD = int(
    "0x12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16
)
SCALAR_FIELD = EDWARDS_BLS12_BASE_FIELD

#: BLS12-377 G1 generator. Reference: bls12_377.ts:21-29
BLS12_377_G1_GENERATOR_X = int(
    "81937999373150964239938255573465948239988671502647976594219695644855"
    "304257327692006745978603320413799295628339695"
)
BLS12_377_G1_GENERATOR_Y = int(
    "241266749859715473739788878240585681733927191168601896383759122102112"
    "907357779751001206799952863815012735208165030"
)

#: Twisted Edwards BLS12 parameters (a, d) and generator.
#: Reference: src/reference/utils/FieldMath.ts:8-9,108-109
EDWARDS_A = EDWARDS_BLS12_BASE_FIELD - 1  # a = -1 mod p
EDWARDS_D = 3021
EDWARDS_GENERATOR_X = int(
    "1540945439182663264862696551825005342995406165131907382295858612069623286213"
)
EDWARDS_GENERATOR_Y = int(
    "8003546896475222703853313610036801932325312921786952001586936882361378122196"
)
#: Order of the prime-order subgroup of Edwards BLS12 (the BLS12-377 scalar
#: field divided by the cofactor 4). Reference: FieldMath.ts:10
EDWARDS_SUBGROUP_CHARACTERISTIC = int(
    "2111115437357092606062206234695386632838870926408408195193685246394721360383"
)


class CurveId(enum.Enum):
    """Curve selector. Reference: cuzk/bls12_377.ts:4-7 (enum Curve)."""

    BLS12_377 = "bls12_377"  # short Weierstrass y^2 = x^3 + 1, 377-bit field
    EDWARDS_BLS12 = "edwards_bls12"  # twisted Edwards a=-1, d=3021, 253-bit


def base_field_modulus(curve: CurveId) -> int:
    if curve == CurveId.BLS12_377:
        return BLS12_377_BASE_FIELD
    return EDWARDS_BLS12_BASE_FIELD


# ---------------------------------------------------------------------------
# Montgomery / Barrett parameter derivation
# ---------------------------------------------------------------------------


def egcd(a: int, b: int) -> tuple[int, int, int]:
    """Extended GCD: returns (g, x, y) with a*x + b*y = g."""
    old_r, r = a, b
    old_s, s = 1, 0
    old_t, t = 0, 1
    while r != 0:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
        old_t, t = t, old_t - q * t
    return old_r, old_s, old_t


def calc_num_words(word_size: int, p_width: int) -> int:
    """Number of limbs so that num_words * word_size > p_width.

    Mirrors utils.ts:435-446 including its special case for (377, 15).
    """
    num_words = p_width // word_size
    while num_words * word_size <= p_width:
        num_words += 1
    if p_width == 377 and word_size == 15:
        num_words = 27
    return num_words


@dataclasses.dataclass(frozen=True)
class MontParams:
    """All derived constants needed by the limb kernels.

    Mirrors the return value of compute_misc_params (utils.ts:484-533), with
    the extra convenience fields r2 (to enter Montgomery form with a single
    Montgomery product) and mu (vanilla Barrett; utils.ts:354-369).
    """

    p: int  # field modulus
    word_size: int  # bits per limb (w)
    num_words: int  # limb count
    max_terms: int
    k: int  # max number of 2w-bit terms summable in a u32
    nsafe: int  # iterations between carries in the Montgomery inner loop
    n0: int  # -p^-1 mod 2^w
    r: int  # Montgomery radix 2^(num_words*word_size) mod p
    rinv: int  # r^-1 mod p
    r2: int  # r^2 mod p
    mu: int  # Barrett constant floor(4^x / p) for smallest 2^x > p
    barrett_domb_m: int
    p_width: int  # bit length of p

    @property
    def mask(self) -> int:
        return (1 << self.word_size) - 1

    @property
    def radix_bits(self) -> int:
        return self.num_words * self.word_size

    @property
    def slack(self) -> int:
        """Unused top bits of the limb representation (barrett.template.wgsl)."""
        return self.radix_bits - self.p_width

    def to_mont(self, x: int) -> int:
        """x -> x * r mod p (enter Montgomery form)."""
        return (x * self.r) % self.p

    def from_mont(self, x: int) -> int:
        """x * rinv mod p (leave Montgomery form)."""
        return (x * self.rinv) % self.p


@lru_cache(maxsize=None)
def compute_misc_params(p: int, word_size: int) -> MontParams:
    """Derive limb, Montgomery and Barrett constants for modulus p.

    Bit-for-bit mirror of utils.ts:484-533 plus compute_mont_constants
    (utils.ts:452-482).
    """
    assert word_size > 0
    p_width = p.bit_length()
    max_int_width = 32
    num_words = calc_num_words(word_size, p_width)
    max_terms = num_words * 2

    rhs = 2**max_int_width
    k = 1
    while k * 2 ** (2 * word_size) <= rhs:
        k += 1
    nsafe = k // 2

    r_full = 2 ** (num_words * word_size)

    g, rinv, pprime = egcd(r_full, p)
    assert g == 1, "r and p must be coprime"
    if rinv < 0:
        rinv = (rinv % p) + p
    if pprime < 0:
        pprime = (pprime % r_full) + r_full
    assert (r_full * rinv) % p == 1
    assert (p * pprime) % r_full == 1

    neg_n_inv = r_full - pprime
    n0 = neg_n_inv % (2**word_size)

    # Vanilla Barrett mu (utils.ts:354-369): smallest x with 2^x > p.
    x = 1
    while 2**x < p:
        x += 1
    mu = 4**x // p

    # Barrett-Domb m (utils.ts:517-519)
    z = num_words * word_size - p_width
    barrett_domb_m = 2 ** (2 * p_width + z) // p

    return MontParams(
        p=p,
        word_size=word_size,
        num_words=num_words,
        max_terms=max_terms,
        k=k,
        nsafe=nsafe,
        n0=n0,
        r=r_full % p,
        rinv=rinv,
        r2=(r_full * r_full) % p,
        mu=mu,
        barrett_domb_m=barrett_domb_m,
        p_width=p_width,
    )


#: Production word size. The reference uses 13-bit limbs in u32 lanes so the
#: Montgomery inner loop is carry-free (nsafe=32 >= num_words=30); the same
#: analysis holds for TPU uint32 VPU lanes. Reference: submission.ts:80,
#: README.md:386-396.
WORD_SIZE = 13

#: MontParams for the production BLS12-377 configuration (30 limbs x 13 bits).
BLS12_377_PARAMS = compute_misc_params(BLS12_377_BASE_FIELD, WORD_SIZE)

#: MontParams for the Edwards BLS12 configuration (20 limbs x 13 bits).
EDWARDS_PARAMS = compute_misc_params(EDWARDS_BLS12_BASE_FIELD, WORD_SIZE)


def mont_params_for(curve: CurveId, word_size: int = WORD_SIZE) -> MontParams:
    return compute_misc_params(base_field_modulus(curve), word_size)
