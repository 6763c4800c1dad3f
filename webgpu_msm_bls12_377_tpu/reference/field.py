"""Plain-bigint prime field helpers (oracle layer).

The analogue of @noble/curves' Field + @celo/bls12377js F wrappers used by
the reference as its CPU ground truth (src/reference/utils/FieldMath.ts:26,
src/submission/implementation/cuzk/bls12_377.ts:31-33).
"""

from __future__ import annotations


def fadd(a: int, b: int, p: int) -> int:
    return (a + b) % p


def fsub(a: int, b: int, p: int) -> int:
    return (a - b) % p


def fmul(a: int, b: int, p: int) -> int:
    return (a * b) % p


def fneg(a: int, p: int) -> int:
    return (-a) % p


def finv(a: int, p: int) -> int:
    """Modular inverse via Fermat (p prime)."""
    if a % p == 0:
        raise ZeroDivisionError("inverse of 0")
    return pow(a, p - 2, p)


def fsqrt(a: int, p: int) -> int | None:
    """Tonelli-Shanks square root; returns None if a is not a QR."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        t2i, i = t, 0
        for i in range(1, m):
            t2i = (t2i * t2i) % p
            if t2i == 1:
                break
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, (b * b) % p
        t = (t * c) % p
        r = (r * b) % p
    return r
