"""u32-machine-emulated Montgomery / Barrett multiplication oracles.

Python models of the reference's three Montgomery product algorithm families
and the vanilla Barrett field multiply, with explicit 32-bit wraparound so
that overflow behaviour matches device uint32 lanes exactly:

- mont_mul_optimised: carry-free inner loop, valid for word_size <= 13
  (src/submission/implementation/wgsl/montgomery/mont_pro_product.template.wgsl:15-62
  and mont_pro_optimized.template.wgsl)
- mont_mul_modified: periodic carries every nsafe iterations, for
  word_size 14-15 (mont_pro_modified.template.wgsl:27-95)
- mont_mul_cios: classic CIOS with full carries, word_size 16
  (mont_pro_cios.template.wgsl:42-126)
- barrett_mul: schoolbook 2N-limb multiply + vanilla Barrett reduction
  (wgsl/cuzk/barrett.template.wgsl:20-82)

These are the oracles the JAX kernels are differentially tested against,
mirroring the JS models in src/submission/miscellaneous/tests/mont_mul.test.ts.
"""

from __future__ import annotations

from ..params import MontParams
from .limbs import from_words_le_unchecked, to_words_le

U32 = 0xFFFFFFFF


def machine_mul(a: int, b: int) -> int:
    """u32 multiply with wraparound (mont_mul.test.ts:461-467)."""
    return (a * b) & U32


def machine_add(a: int, b: int) -> int:
    return (a + b) & U32


def bigint_add(a: list[int], b: list[int], word_size: int) -> tuple[list[int], int]:
    """Multiprecision add with carry (bigint.template.wgsl bigint_add)."""
    mask = (1 << word_size) - 1
    res = [0] * len(a)
    carry = 0
    for j in range(len(a)):
        c = a[j] + b[j] + carry
        res[j] = c & mask
        carry = c >> word_size
    return res, carry


def bigint_sub(a: list[int], b: list[int], word_size: int) -> tuple[list[int], int]:
    """Multiprecision subtract with borrow (bigint.template.wgsl bigint_sub)."""
    two_pow = 1 << word_size
    res = [0] * len(a)
    borrow = 0
    for i in range(len(a)):
        r = (a[i] - b[i] - borrow) & U32
        if a[i] < b[i] + borrow:
            r = (r + two_pow) & U32
            borrow = 1
        else:
            borrow = 0
        res[i] = r
    return res, borrow


def bigint_gt(x: list[int], y: list[int]) -> int:
    """1 if x > y else 0, most-significant-limb first (bigint_gt)."""
    for i in reversed(range(len(x))):
        if x[i] < y[i]:
            return 0
        if x[i] > y[i]:
            return 1
    return 0


def conditional_reduce(s: list[int], p_limbs: list[int], word_size: int) -> list[int]:
    if bigint_gt(s, p_limbs) == 1:
        res, _ = bigint_sub(s, p_limbs, word_size)
        return res
    return s


def mont_mul_optimised(
    x_limbs: list[int], y_limbs: list[int], params: MontParams
) -> list[int]:
    """Carry-free Montgomery product (valid iff nsafe >= num_words).

    Emulates mont_pro_product.template.wgsl:15-62 with u32 wraparound: with
    word_size=13 the inner accumulators peak at ~60*(2^13-1)^2 < 2^32, so no
    carries are needed until the final sweep. Running this with word_size
    14/15 silently overflows (the overflow unit test demonstrates that,
    mirroring mont_mul.test.ts:446-459).
    """
    n = params.num_words
    w = params.word_size
    mask = params.mask
    n0 = params.n0
    p_limbs = to_words_le(params.p, n, w)

    s = [0] * n
    for i in range(n):
        t = machine_add(s[0], machine_mul(x_limbs[i], y_limbs[0]))
        tprime = t & mask
        qi = machine_mul(n0, tprime) & mask
        c = machine_add(t, machine_mul(qi, p_limbs[0])) >> w
        s[0] = machine_add(
            machine_add(s[1], machine_mul(x_limbs[i], y_limbs[1])),
            machine_add(machine_mul(qi, p_limbs[1]), c),
        )
        for j in range(2, n):
            s[j - 1] = machine_add(
                s[j],
                machine_add(
                    machine_mul(x_limbs[i], y_limbs[j]),
                    machine_mul(qi, p_limbs[j]),
                ),
            )
        s[n - 2] = machine_add(
            machine_mul(x_limbs[i], y_limbs[n - 1]),
            machine_mul(qi, p_limbs[n - 1]),
        )

    c = 0
    for i in range(n):
        v = machine_add(s[i], c)
        c = v >> w
        s[i] = v & mask

    return conditional_reduce(s, p_limbs, w)


def mont_mul_modified(
    x_limbs: list[int], y_limbs: list[int], params: MontParams
) -> list[int]:
    """Montgomery product with carries every nsafe inner iterations.

    Emulates mont_pro_modified.template.wgsl:27-95 (word sizes 14-15).
    """
    n = params.num_words
    w = params.word_size
    mask = params.mask
    n0 = params.n0
    nsafe = params.nsafe
    p_limbs = to_words_le(params.p, n, w)

    s = [0] * n
    for i in range(n):
        t = machine_add(s[0], machine_mul(x_limbs[i], y_limbs[0]))
        tprime = t & mask
        qi = machine_mul(n0, tprime) & mask
        c = machine_add(t, machine_mul(qi, p_limbs[0])) >> w

        for j in range(1, n - 1):
            tj = machine_add(
                s[j],
                machine_add(
                    machine_mul(x_limbs[i], y_limbs[j]),
                    machine_mul(qi, p_limbs[j]),
                ),
            )
            if (j - 1) % nsafe == 0:
                tj = machine_add(tj, c)
            c = tj >> w
            if j % nsafe == 0:
                c = tj >> w
                s[j - 1] = tj & mask
            else:
                s[j - 1] = tj

        s[n - 2] = machine_add(
            machine_mul(x_limbs[i], y_limbs[n - 1]),
            machine_mul(qi, p_limbs[n - 1]),
        )

    c = 0
    for i in range(n):
        v = machine_add(s[i], c)
        c = v >> w
        s[i] = v & mask

    return conditional_reduce(s, p_limbs, w)


def mont_mul_cios(
    a_limbs: list[int], b_limbs: list[int], params: MontParams
) -> list[int]:
    """CIOS Montgomery product with full carries (word_size 16).

    Emulates mont_pro_cios.template.wgsl:42-126. Note the reference hardcodes
    n0 = 65535 there, which equals -p^-1 mod 2^16 for both supported moduli;
    we use params.n0 which is the general value.
    """
    n = params.num_words
    w = params.word_size
    mask = params.mask
    n0 = params.n0
    p_limbs = to_words_le(params.p, n, w)

    t = [0] * (n + 2)
    for i in range(n):
        c = 0
        for j in range(n):
            r = machine_add(machine_add(t[j], machine_mul(a_limbs[j], b_limbs[i])), c)
            c = r >> w
            t[j] = r & mask
        r = machine_add(t[n], c)
        t[n + 1] = r >> w
        t[n] = r & mask

        m = machine_mul(t[0], n0) % 65536 if w == 16 else machine_mul(t[0], n0) & mask
        r = machine_add(t[0], machine_mul(m, p_limbs[0]))
        c = r >> w
        for j in range(1, n):
            r = machine_add(machine_add(t[j], machine_mul(m, p_limbs[j])), c)
            c = r >> w
            t[j - 1] = r & mask
        r = machine_add(t[n], c)
        c = r >> w
        t[n - 1] = r & mask
        t[n] = machine_add(t[n + 1], c)

    # conditional subtract (t may be up to 2p-1, and has n+1 live limbs)
    t_lt_n = False
    for i in reversed(range(n + 1)):
        pi = p_limbs[i] if i < n else 0
        if t[i] < pi:
            t_lt_n = True
            break
        elif t[i] > pi:
            break

    if t_lt_n:
        return t[:n]
    borrow = 0
    out = [0] * n
    for i in range(n):
        r = (t[i] - p_limbs[i] - borrow) & U32
        if t[i] < p_limbs[i] + borrow:
            r = (r + (1 << w)) & U32
            borrow = 1
        else:
            borrow = 0
        out[i] = r
    return out


def mont_mul(x: int, y: int, params: MontParams) -> int:
    """Bigint-level Montgomery product dispatch (returns x*y*rinv mod p)."""
    xl = to_words_le(x, params.num_words, params.word_size)
    yl = to_words_le(y, params.num_words, params.word_size)
    if params.word_size <= 13:
        out = mont_mul_optimised(xl, yl, params)
    elif params.word_size <= 15:
        out = mont_mul_modified(xl, yl, params)
    else:
        out = mont_mul_cios(xl, yl, params)
    return from_words_le_unchecked(out, params.word_size)


# ---------------------------------------------------------------------------
# Vanilla Barrett multiplication (used by stage 1 to enter Montgomery form)
# ---------------------------------------------------------------------------


def wide_mul(a: list[int], b: list[int], word_size: int) -> list[int]:
    """Schoolbook N x N -> 2N limb multiply (barrett.template.wgsl mul:20)."""
    n = len(a)
    mask = (1 << word_size) - 1
    res = [0] * (2 * n)
    for i in range(n):
        for j in range(n):
            c = machine_mul(a[i], b[j])
            res[i + j] = machine_add(res[i + j], c & mask)
            res[i + j + 1] = machine_add(res[i + j + 1], c >> word_size)
    for i in range(2 * n - 1):
        res[i + 1] = machine_add(res[i + 1], res[i] >> word_size)
        res[i] = res[i] & mask
    return res


def sub_512(a: list[int], b: list[int], word_size: int) -> tuple[list[int], int]:
    """2N-limb subtract with borrow (barrett.template.wgsl sub_512:38)."""
    mask = (1 << word_size) - 1
    res = [0] * len(a)
    borrow = 0
    for i in range(len(a)):
        r = (a[i] - b[i] - borrow) & U32
        if a[i] < b[i] + borrow:
            r = (r + mask + 1) & U32
            borrow = 1
        else:
            borrow = 0
        res[i] = r
    return res, borrow


def get_higher_with_slack(a: list[int], params: MontParams) -> list[int]:
    """Approximate floor(a / 2^p_width) (barrett.template.wgsl:52)."""
    n = params.num_words
    w = params.word_size
    mask = params.mask
    slack = params.slack
    out = [0] * n
    for i in range(n):
        out[i] = ((a[i + n] << slack) + (a[i + n - 1] >> (w - slack))) & mask
    return out


def barrett_mul_limbs(
    a: list[int], b: list[int], params: MontParams
) -> list[int]:
    """Full a*b mod p via vanilla Barrett (barrett.template.wgsl field_mul:60)."""
    n = params.num_words
    w = params.word_size
    p_limbs = to_words_le(params.p, n, w)
    p_wide = p_limbs + [0] * n
    mu_limbs = to_words_le(params.mu, n, w)

    xy = wide_mul(a, b, w)
    xy_hi = get_higher_with_slack(xy, params)
    l = wide_mul(xy_hi, mu_limbs, w)
    l_hi = get_higher_with_slack(l, params)
    lp = wide_mul(l_hi, p_limbs, w)
    r_wide, _ = sub_512(xy, lp, w)

    r_wide_reduced, underflow = sub_512(r_wide, p_wide, w)
    if underflow == 0:
        r_wide = r_wide_reduced
    r = r_wide[:n]
    # final fr_reduce (field.template.wgsl fr_reduce:7)
    return conditional_reduce(r, p_limbs, w)


def barrett_mul(x: int, y: int, params: MontParams) -> int:
    xl = to_words_le(x, params.num_words, params.word_size)
    yl = to_words_le(y, params.num_words, params.word_size)
    return from_words_le_unchecked(barrett_mul_limbs(xl, yl, params), params.word_size)


# ---------------------------------------------------------------------------
# Barrett-Domb multiplication (benchmark variant)
# ---------------------------------------------------------------------------
#
# u32-machine model of the reference's Barrett-Domb shader
# (src/submission/miscellaneous/wgsl/barrett_domb.template.wgsl:1-188,
# itself adapted from ingonyama-zk/modular_multiplication): a Barrett
# variant that left-aligns the product and uses MSB/LSB half-multiplies so
# the estimate is off by at most a couple of subtractions.


def _machine_two_digit_add(a: list[int], b: list[int], word_size: int):
    mask = (1 << word_size) - 1
    carry = 0
    res = [0, 0, 0]
    for i in range(2):
        s = a[i] + b[i] + carry
        res[i] = s & mask
        carry = s >> word_size
    res[2] = carry
    return res


def _mp_shifter_left(a: list[int], shift: int, word_size: int) -> list[int]:
    """BigIntWide << shift, for word_size <= shift < 2*word_size."""
    mask = (1 << word_size) - 1
    n2 = len(a)
    res = [0] * n2
    carry = 0
    x = shift - word_size
    for i in range(1, n2):
        res[i] = ((a[i - 1] << x) & mask) + carry
        carry = a[i - 1] >> (word_size - x)
    return res


def _mp_shifter_right(a: list[int], shift: int, num_words: int, word_size: int):
    """BigIntMediumWide >> shift -> BigInt (top num_words limbs)."""
    two_w = 1 << word_size
    res = [0] * num_words
    borrow = 0
    for idx in range(num_words):
        i = num_words - idx - 1
        new_borrow = (a[i] << (word_size - shift)) & U32
        res[i] = ((a[i] >> shift) | borrow) % two_w
        borrow = new_borrow
    return res


def _mp_msb_multiply(a_wide, b, num_words, word_size):
    """MSB half-product of a_wide's top half with b (barrett_domb:76-95)."""
    c = [0] * (num_words + 1)
    for l in range(num_words - 1, 2 * num_words - 1):
        i_min = l - (num_words - 1)
        for i in range(i_min, num_words):
            v = l + 1 - num_words
            prod = a_wide[num_words + i] * b[l - i]
            mult_res = [prod & ((1 << word_size) - 1), prod >> word_size]
            add_res = _machine_two_digit_add(
                mult_res, [c[v], c[v + 1]], word_size
            )
            c[v] = add_res[0]
            c[v + 1] = add_res[1]
            if v + 2 < len(c):
                c[v + 2] += add_res[2]
    return c


def _mp_lsb_multiply(a, b, num_words, word_size):
    """LSB half-product (barrett_domb:97-108)."""
    c = [0] * (num_words + 2)
    for l in range(num_words):
        i_min = max(0, l - (num_words - 1))
        i_max = min(l, num_words - 1) + 1
        for i in range(i_min, i_max):
            prod = a[i] * b[l - i]
            mult_res = [prod & ((1 << word_size) - 1), prod >> word_size]
            add_res = _machine_two_digit_add(
                mult_res, [c[l], c[l + 1]], word_size
            )
            c[l] = add_res[0]
            c[l + 1] = add_res[1]
            c[l + 2] += add_res[2]
    return c[: num_words + 1]


def barrett_domb_mul_limbs(a, b, params: MontParams) -> list[int]:
    """Full Barrett-Domb modular multiply (barrett_domb field_mul:166-188)."""
    n = params.num_words
    w = params.word_size
    mask = params.mask
    p_limbs = to_words_le(params.p, n, w)
    m_limbs = to_words_le(params.barrett_domb_m, n, w)
    z = n * w - params.p_width

    ab = wide_mul(a, b, w)
    ab_shift = _mp_shifter_left(ab, 2 * z, w)
    l = _mp_msb_multiply(ab_shift, m_limbs, n, w)

    # l_add_ab_msb = (l >> one limb) + top half of ab_shift
    c = [0] * (n + 1)
    carry = 0
    for i in range(n):
        x = l[i + 1] + ab_shift[n + i] + carry
        c[i] = x & mask
        carry = x >> w
    l2 = _mp_shifter_right(c, z, n, w)

    ls = _mp_lsb_multiply(l2, p_limbs, n, w)

    # result = ab - ls (num_words limbs, with borrow)
    res = [0] * n
    borrow = 0
    for i in range(n):
        r = (ab[i] - ls[i] - borrow) & U32
        if ab[i] < ls[i] + borrow:
            r = (r + (1 << w)) & U32
            borrow = 1
        else:
            borrow = 0
        res[i] = r

    while bigint_gt(res, p_limbs) == 1:
        res, _ = bigint_sub(res, p_limbs, w)
    return res


def barrett_domb_mul(x: int, y: int, params: MontParams) -> int:
    xl = to_words_le(x, params.num_words, params.word_size)
    yl = to_words_le(y, params.num_words, params.word_size)
    return from_words_le_unchecked(
        barrett_domb_mul_limbs(xl, yl, params), params.word_size
    )
