"""Vectorized multiprecision field arithmetic on TPU VPU lanes.

This is the TPU-native equivalent of the reference's WGSL bigint/field/
Montgomery/Barrett device library:

- bigint add/sub/compare with carry chains:
  src/submission/implementation/wgsl/bigint/bigint.template.wgsl:1-46
- field add/sub/reduce: src/submission/implementation/wgsl/field/field.template.wgsl
- carry-free Montgomery product (word_size<=13, nsafe>=num_words):
  src/submission/implementation/wgsl/montgomery/mont_pro_product.template.wgsl:15-62
- schoolbook widening mul + vanilla Barrett reduction:
  src/submission/implementation/wgsl/cuzk/barrett.template.wgsl:20-82

Design notes (TPU-first, not a translation):

* A batch of field elements is a single uint32 array of shape
  ``(num_words, N)`` — limb-major so each limb is a contiguous lane vector
  the 8x128 VPU sweeps in one pass.  All functions are elementwise over the
  trailing batch axes and broadcast: a ``(num_words, 1)`` constant operand
  (e.g. the Montgomery constant r^2) multiplies a ``(num_words, N)`` batch.
* Limbs are 13-bit words in uint32 lanes.  The reference's overflow
  analysis (README.md:386-396) carries over unchanged: uint32 VPU lanes
  hold 13x13-bit products plus accumulation headroom, so the Montgomery
  inner loop is carry-free (nsafe=32 >= num_words=30) and only a final
  sweep resolves carries.  uint32 wraparound on TPU matches the
  u32-machine oracle in reference/mont.py bit for bit.
* Carry/borrow chains are *not* 30 sequential data-dependent steps (the
  WGSL formulation): they are resolved with a constant number of
  full-width normalization rounds followed by a log-depth Kogge-Stone
  generate/propagate prefix scan over the limb axis.  This keeps both the
  XLA graph small (compile time) and the critical path short (runtime).
* The Montgomery outer loop is a lax.scan over the multiplier limbs, so
  the traced graph is one body regardless of limb count; XLA may unroll.
* Everything is shape-static and branch-free (jnp.where), so the whole MSM
  pipeline traces into one XLA program (the analogue of the reference's
  single queue.submit command stream, submission.ts:281-288).
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CurveId, MontParams, mont_params_for
from ..reference.limbs import to_words_le

U32 = jnp.uint32

# -- soft (redundant) limb domain --------------------------------------------
#
# Strict limbs are < 2^w; restoring them after every op costs a log-depth
# Kogge-Stone carry prefix (~25 vector ops).  But the Montgomery overflow
# analysis has slack: with limb bound L instead of mask, the interleaved
# product needs n*(L^2 + mask^2) < 2^32 and the pair-REDC product phase
# needs 2n*L^2 < 2^32.  For w=13, n=30 both hold up to L ~ 8400, so lazy
# ops only need limbs <= SOFT_LIMB_MAX = mask + 127 = 8318 — reachable
# with plain constant folds and NO carry prefix at all (a fold from
# <=20-bit values leaves carries <= 127).  One strict resolve at
# field_canon entry restores canonical limbs before any bigint compare.
# MSM_SOFT_CARRY=0 pins the strict-limb forms for A/B (set before the
# first trace; the exec cache keys on it).

SOFT_SLACK_BITS = 7  # folds stop once carries fit 7 bits
SOFT_FOLD_BITS = 13 + SOFT_SLACK_BITS  # fold while values can exceed 2^20


def soft_limb_max(word_size: int) -> int:
    return (1 << word_size) - 1 + (1 << SOFT_SLACK_BITS)


def _soft_on() -> bool:
    return os.environ.get("MSM_SOFT_CARRY", "1") != "0"


def _lazy_koff(word_size: int) -> int:
    """Per-limb offset for the soft-domain negation trick: K_i must cover
    every soft limb (> soft_limb_max)."""
    return soft_limb_max(word_size) + 2


def lazy_koff_int(num_words: int, word_size: int) -> int:
    """The bigint K = sum K_i 2^(w i): -b == (K -limbwise- b) - K exactly,
    for any b with limbs <= soft_limb_max (mod 2^(W*w))."""
    k_i = _lazy_koff(word_size)
    return sum(k_i << (word_size * i) for i in range(num_words))


def lazy_sub_col(value_k_p: int, num_words: int, word_size: int) -> np.ndarray:
    """The (W, 1) constant column lazy_sub/lazy_neg expect for a given k*p
    offset: (k*p - K) mod 2^(W*w) in soft mode, plain k*p otherwise."""
    if _soft_on():
        value_k_p = (
            value_k_p - lazy_koff_int(num_words, word_size)
        ) % (1 << (num_words * word_size))
    return _col(value_k_p, num_words, word_size)


def _col(value: int, num_words: int, word_size: int) -> np.ndarray:
    """A constant bigint as a (num_words, 1) uint32 column (broadcastable).

    Kept as a *numpy* array: numpy operands trace as inline constants, which
    jnp ops accept everywhere and — unlike captured jax Arrays — are legal
    inside Pallas kernel bodies (ops/pallas_kernels.py).
    """
    return np.array(to_words_le(value, num_words, word_size), dtype=np.uint32)[
        :, None
    ]


@dataclasses.dataclass(frozen=True)
class FieldCtx:
    """Device-side constants for one field configuration.

    The TPU analogue of the reference's ShaderManager constant baking
    (src/submission/implementation/cuzk/shader_manager.ts:24-78): instead of
    rendering mustache limb constants into WGSL source, the constants are
    jnp arrays closed over by jitted functions, so XLA folds them into the
    compiled program.
    """

    params: MontParams
    p_col: np.ndarray  # (W, 1) modulus limbs
    r2_col: np.ndarray  # (W, 1) r^2 mod p — to_mont via one mont_mul
    one_mont_col: np.ndarray  # (W, 1) r mod p — 1 in Montgomery form
    one_col: np.ndarray  # (W, 1) plain 1 — from_mont via one mont_mul
    mu_col: np.ndarray  # (W, 1) Barrett mu limbs
    #: Unroll the Montgomery outer loop into straight-line code.  Needed
    #: inside Pallas kernel bodies, where lax.scan's per-step xs slicing
    #: (dynamic_slice) has no Mosaic lowering.
    unroll_mont: bool = False

    @property
    def num_words(self) -> int:
        return self.params.num_words

    @property
    def word_size(self) -> int:
        return self.params.word_size

    @property
    def mask(self) -> int:
        return self.params.mask

    def zeros(self, batch_shape: tuple[int, ...]) -> jnp.ndarray:
        return jnp.zeros((self.num_words, *batch_shape), dtype=U32)

    def const(self, value: int) -> np.ndarray:
        """Arbitrary constant as a broadcastable (W, 1) column."""
        return _col(value, self.num_words, self.word_size)


@lru_cache(maxsize=None)
def field_ctx(curve: CurveId, word_size: int = 13) -> FieldCtx:
    params = mont_params_for(curve, word_size)
    w, n = params.word_size, params.num_words
    return FieldCtx(
        params=params,
        p_col=_col(params.p, n, w),
        r2_col=_col(params.r2, n, w),
        one_mont_col=_col(params.r, n, w),
        one_col=_col(1, n, w),
        mu_col=_col(params.mu, n, w),
    )


# ---------------------------------------------------------------------------
# Carry machinery: normalization rounds + Kogge-Stone prefix scan
# ---------------------------------------------------------------------------


def _shift_up(c: jnp.ndarray) -> jnp.ndarray:
    """Move per-limb carries one limb up; the top carry falls off."""
    return jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)


def _carry_prefix(
    g: jnp.ndarray, p: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exclusive carry/borrow prefix over the limb axis (log-depth).

    g[i]: limb i generates a carry; p[i]: limb i propagates an incoming
    carry.  Both uint32 0/1 planes: i1 (bool) concats/slices crash the
    Mosaic TPU backend, so the whole prefix runs in integer 0/1 arithmetic.
    Returns (carry_in per limb, carry_out of the top limb as a (1, batch)
    row — the module-wide lane-mask convention).
    """

    # Explicit Kogge-Stone inclusive scan (log2(W) shift-combine steps).
    # Not lax.associative_scan: its interleaving lax.pad lowering is
    # unsupported inside Pallas/Mosaic kernel bodies.
    G, P = g, p
    n = g.shape[0]
    d = 1
    while d < n:
        pad_g = jnp.zeros_like(G[:d])  # identity: generates nothing,
        pad_p = jnp.ones_like(P[:d])  # propagates everything
        G_lo = jnp.concatenate([pad_g, G[:-d]], axis=0)
        P_lo = jnp.concatenate([pad_p, P[:-d]], axis=0)
        G = G | (P & G_lo)
        P = P & P_lo
        d *= 2
    carry_in = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    # Row-shaped (1, batch) carry-out, positively indexed: negative scalar
    # indexing lowers to dynamic_slice and 1-D intermediates are hostile to
    # the Mosaic TPU compiler, so every lane mask in this module is a
    # (1, batch) row.
    return carry_in, G[n - 1 : n]


def resolve_carries(
    ctx: FieldCtx, s: jnp.ndarray, value_bits: int = 32, soft: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize per-limb values < 2^value_bits into w-bit limbs.

    Strict mode: constant-round reduction (each round folds the carry
    field one limb up, shrinking it by w bits) followed by one log-depth
    single-bit carry ripple; limbs return canonical (< 2^w).  Returns
    (normalized limbs, carry_out bool).  Carries past the top limb are
    dropped, mirroring the WGSL final sweep
    (mont_pro_product.template.wgsl:52-57) — callers guarantee no overflow.

    Soft mode (lazy domain only): folds until carries fit SOFT_SLACK_BITS
    and skips the carry prefix entirely — limbs return <= soft_limb_max
    (8318 at w=13), which the Montgomery overflow analysis tolerates (see
    module notes).  carry_out is None (top carries provably zero for all
    lazy-domain values, which stay far below 2^(W*w)).
    """
    w, mask = ctx.word_size, ctx.mask
    bits = value_bits
    if soft and _soft_on():
        while bits > SOFT_FOLD_BITS:
            s = (s & mask) + _shift_up(s >> w)
            bits = max(w, bits - w) + 1
        # one final fold: limbs <= mask + 2^(bits - w) <= soft_limb_max
        s = (s & mask) + _shift_up(s >> w)
        return s, None
    while bits > w + 1:
        s = (s & mask) + _shift_up(s >> w)
        bits = max(w, bits - w) + 1
    g = s >> w  # s < 2^(w+1): carry is already 0 or 1
    p = ((s & mask) == mask).astype(U32)
    carry_in, carry_out = _carry_prefix(g, p)
    return (s + carry_in) & mask, carry_out


# ---------------------------------------------------------------------------
# Multiprecision integer primitives (bigint.template.wgsl)
# ---------------------------------------------------------------------------


def bigint_add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Carry-propagating add of normalized limb vectors (bigint_add:11).

    The final carry is dropped, which is safe for field values since
    2p < 2^(W*w).
    """
    out, _ = resolve_carries(ctx, a + b, value_bits=ctx.word_size + 1)
    return out


def bigint_sub(
    ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Borrow-propagating subtract (bigint_sub:21). Returns (diff, borrow).

    On borrow the result wraps mod 2^(W*w), exactly like the WGSL original;
    callers either know a >= b or use the borrow flag to select.
    """
    mask = ctx.mask
    g = (a < b).astype(U32)
    p = (a == b).astype(U32)
    borrow_in, borrow_out = _carry_prefix(g, p)
    diff = (a - b - borrow_in) & mask
    return diff, borrow_out


def bigint_lt(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a < b lexicographically: borrow-out of a - b, (1, batch) row."""
    g = (a < b).astype(U32)
    p = (a == b).astype(U32)
    _, borrow_out = _carry_prefix(g, p)
    return borrow_out


def bigint_gt(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a > b lexicographically (bigint_gt:35), (1, batch) row."""
    return bigint_lt(ctx, b, a)


def bigint_is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """True where every limb is zero, as a (1, batch) row mask."""
    return jnp.all(a == 0, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Field ops mod p (field.template.wgsl)
# ---------------------------------------------------------------------------


def cond_reduce(ctx: FieldCtx, s: jnp.ndarray) -> jnp.ndarray:
    """Subtract p where s > p strictly.

    This is the Montgomery-exit `conditional_reduce` semantics
    (mont_pro_product.template.wgsl:58-61); for inputs produced by REDC on
    canonical operands, s == p is unreachable, so the output is canonical.
    """
    p = jnp.broadcast_to(ctx.p_col, s.shape)
    diff, borrow = bigint_sub(ctx, s, p)
    not_eq = jnp.any(diff != 0, axis=0, keepdims=True)
    take_diff = (borrow == 0) & not_eq  # s > p strictly
    return jnp.where(take_diff, diff, s)


def field_reduce(ctx: FieldCtx, s: jnp.ndarray) -> jnp.ndarray:
    """Subtract p where s >= p (fr_reduce, field.template.wgsl:7-16).

    Unlike the reference's fr_sub (which can emit the non-canonical value p
    for equal operands), every field op in this library keeps values
    canonical (< p), matching the plain-bigint oracle in reference/curve.py.
    """
    p = jnp.broadcast_to(ctx.p_col, s.shape)
    diff, borrow = bigint_sub(ctx, s, p)
    return jnp.where(borrow == 0, diff, s)


def field_add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p with one conditional subtract (fr_add)."""
    return field_reduce(ctx, bigint_add(ctx, a, b))


def field_sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p, branch-free (fr_sub, field.template.wgsl:18)."""
    diff, borrow = bigint_sub(ctx, a, b)
    wrapped = bigint_add(ctx, diff, jnp.broadcast_to(ctx.p_col, diff.shape))
    return jnp.where(borrow == 1, wrapped, diff)


def field_neg(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p with the canonical-zero guard (bls12_377.ts:64-69)."""
    diff, _ = bigint_sub(ctx, jnp.broadcast_to(ctx.p_col, a.shape), a)
    return jnp.where(bigint_is_zero(a), a, diff)


# ---------------------------------------------------------------------------
# Lazy (redundant) field arithmetic for the hot point kernels
# ---------------------------------------------------------------------------
#
# Inside the SMVP stream kernel the expensive invariant "every value < p"
# buys nothing: only the LIMBS must stay 13-bit (so Montgomery
# accumulation stays carry-free), while values may grow to k*p as long as
# k*p < 2^(W*w) = 2^390 and Montgomery inputs satisfy
# bound(a)*bound(b)*p^2/R + p < next bound.  Dropping the per-op
# canonical reductions (the cond_reduce after every REDC, the
# subtract-p-select after every add/sub) removes ~1/4 of the point-add's
# vector ops.  ops/curve.py:add_mixed_lazy tracks the exact bounds; one
# field_canon at the end of the stage restores canonical values.


def lazy_add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b with carry normalization only: bound(out) = bound(a)+bound(b).

    No mod-p reduction; limbs return soft (<= soft_limb_max) in soft mode,
    canonical 13-bit otherwise."""
    out, _ = resolve_carries(
        ctx, a + b, value_bits=ctx.word_size + 1, soft=True
    )
    return out


def lazy_triple(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """3*a in one carry pass (RCB's b3 constant): bound(out) = 3*bound(a)."""
    out, _ = resolve_carries(
        ctx, a + a + a, value_bits=ctx.word_size + 2, soft=True
    )
    return out


def lazy_scale(ctx: FieldCtx, a: jnp.ndarray, c: int) -> jnp.ndarray:
    """c*a (small static c <= 8) in one carry pass: bound(out) = c*bound(a)."""
    assert 2 <= c <= 8
    out, _ = resolve_carries(
        ctx,
        a * jnp.uint32(c),
        value_bits=ctx.word_size + c.bit_length(),
        soft=True,
    )
    return out


def lazy_sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, k) -> jnp.ndarray:
    """a + k*p - b, exact, for b < k*p and a + k*p - b < 2^(W*w).

    bound(out) = bound(a) + k.  Negation-by-offset form: with the per-limb
    constant K_i > soft_limb_max and K = sum K_i 2^(w i),
    ``-b == (K -limbwise- b) - K`` exactly mod 2^(W*w), so
    ``a + (k*p - K) + (K_i - b_i)`` wraps to the exact non-negative value
    in one carry normalization — no borrow prefix, and (unlike the strict
    two's-complement ``~b`` form) valid for SOFT b limbs.  Per-limb peak
    ~3*2^13 stays far inside uint32.

    k: the int k*p multiple, or a precomputed (W, 1) ``lazy_sub_col``
    column — inside Pallas kernel bodies the column MUST be a kernel
    input (captured array constants are rejected there); the group
    classes ship their columns via _const_arrays (ops/pallas_kernels.py).
    """
    col = (
        lazy_sub_col(k * ctx.params.p, ctx.num_words, ctx.word_size)
        if isinstance(k, int)
        else k
    )
    if _soft_on():
        koff = jnp.uint32(_lazy_koff(ctx.word_size))
        s = a + col + (koff - b)
        out, _ = resolve_carries(
            ctx, s, value_bits=ctx.word_size + 2, soft=True
        )
        return out
    mask = jnp.uint32(ctx.mask)
    s = a + col + (mask - b)
    one0 = jnp.concatenate(
        [jnp.ones((1, *s.shape[1:]), U32), jnp.zeros((s.shape[0] - 1, *s.shape[1:]), U32)],
        axis=0,
    )
    out, _ = resolve_carries(ctx, s + one0, value_bits=ctx.word_size + 2)
    return out


def lazy_neg(ctx: FieldCtx, b: jnp.ndarray, kp) -> jnp.ndarray:
    """k*p - b, exact, for b < k*p: bound(out) = k.

    lazy_sub with a = 0 (one carry pass, no borrow machinery); used to
    turn a difference of products into the sum mont_mul_pair reduces.

    kp: the int multiple k, or a precomputed (W, 1) ``lazy_sub_col``
    column — inside Pallas kernel bodies the column MUST be a kernel
    input.
    """
    col = (
        lazy_sub_col(kp * ctx.params.p, ctx.num_words, ctx.word_size)
        if isinstance(kp, int)
        else kp
    )
    if _soft_on():
        koff = jnp.uint32(_lazy_koff(ctx.word_size))
        s = col + (koff - b)
        out, _ = resolve_carries(
            ctx, s, value_bits=ctx.word_size + 2, soft=True
        )
        return out
    mask = jnp.uint32(ctx.mask)
    s = col + (mask - b)
    one0 = jnp.concatenate(
        [jnp.ones((1, *s.shape[1:]), U32),
         jnp.zeros((s.shape[0] - 1, *s.shape[1:]), U32)],
        axis=0,
    )
    out, _ = resolve_carries(ctx, s + one0, value_bits=ctx.word_size + 2)
    return out


def field_canon(
    ctx: FieldCtx, s: jnp.ndarray, bound: int, kp_cols=None
) -> jnp.ndarray:
    """Reduce a lazy-domain value < bound*p to the canonical residue < p.

    ceil(log2(bound)) conditional subtracts of halving multiples of p.
    kp_cols: optional {k: (W, 1) k*p column} — REQUIRED inside Pallas
    kernel bodies, where fresh array constants cannot be captured
    (the group classes ship their _kp columns as kernel inputs).
    """
    # soft-domain limbs (<= soft_limb_max) must become strictly canonical
    # before any limb-wise bigint compare; one strict resolve (no folds,
    # just the carry prefix) restores them.  No-op for strict inputs.
    s, _ = resolve_carries(ctx, s, value_bits=ctx.word_size + 1)
    k = 1
    while k < bound:
        k *= 2
    while k > 2:
        k //= 2
        col = kp_cols[k] if kp_cols else ctx.const(k * ctx.params.p)
        kp = jnp.broadcast_to(col, s.shape)
        diff, borrow = bigint_sub(ctx, s, kp)
        s = jnp.where(borrow == 0, diff, s)
    # final step subtracts p on s >= p (a lazy value can be exactly p,
    # which cond_reduce's strict compare would leave non-canonical)
    return field_reduce(ctx, s)


# ---------------------------------------------------------------------------
# Montgomery product — the hot function (mont_pro_product.template.wgsl)
# ---------------------------------------------------------------------------


def mont_mul(
    ctx: FieldCtx,
    x: jnp.ndarray,
    y: jnp.ndarray,
    unroll: int = 1,
    lazy: bool = False,
) -> jnp.ndarray:
    """Carry-free Montgomery product: returns x*y*r^-1 mod p, canonical.

    Vectorized mirror of the reference's production "optimised" variant
    (mont_pro_product.template.wgsl:15-62): per multiplier limb x_i the
    quotient digit qi is derived from the running low limb, and the inner
    loop accumulates x_i*y_j + qi*p_j carry-free across all limbs at once —
    one fused (W, N) multiply-add pair per step on the VPU.  Valid iff
    nsafe >= num_words (w=13: nsafe=32 >= 30).

    The outer loop is a lax.scan over the limbs of x (compact graph;
    ``unroll`` is forwarded to XLA).  x and y broadcast over batch axes;
    pass a (W, 1) constant column for scalar multiplicands.
    """
    w, mask = ctx.word_size, ctx.mask
    n = ctx.num_words
    n0 = jnp.uint32(ctx.params.n0)
    # Word sizes above 13 lose the carry-free guarantee (nsafe < n): fold
    # the accumulated carries back into w-bit limbs every step — the
    # lockstep analogue of mont_pro_modified's periodic carries
    # (mont_pro_modified.template.wgsl:27-95, reference/mont.py:135-168).
    # Post-fold limbs are < 2^w + 2^(32-w), so one fold per step keeps
    # every w <= 15 accumulation in u32 (w=16 overflows on a single
    # product pair and stays unusable in 32-bit lanes, as the reference
    # found; README.md:386-430).
    fold_every_step = ctx.params.nsafe < n
    assert w <= 15, (
        f"word_size={w} overflows u32 accumulation: one product pair "
        f"2*(2^{w}-1)^2 already exceeds 2^32"
    )
    if lazy and _soft_on():
        # soft-limb operands: per-step accumulation x_i*y_j + q_i*p_j with
        # x, y limbs <= L and q, p limbs <= mask must stay in u32 over n
        # steps (the nsafe analysis with redundant limbs)
        lmax = soft_limb_max(w)
        assert not fold_every_step and n * (
            lmax * lmax + ctx.mask * ctx.mask
        ) < (1 << 32), (
            f"soft limbs unsupported at word_size={w}: accumulation "
            "overflows u32"
        )

    batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    # The x operand is sliced limb-by-limb; slicing a broadcast of a
    # traced (W, 1) value crashes the Mosaic backend inside Pallas
    # kernels, so put the full-batch operand on the sliced side.  REDC's
    # output is the canonical residue either way, so the swap is
    # value-exact.
    if x.shape[1:] != batch and y.shape[1:] == batch:
        x, y = y, x
    # Pre-broadcast everything the loop body touches to the full (W, N)
    # shape: dual-axis broadcast multiplies (e.g. (1,N)*(W,1)) and
    # squeeze/expand row concats inside a scan body trigger pathological
    # XLA compile times, while same-shape elementwise + slice-concat
    # compiles and fuses cleanly.
    yfull = jnp.broadcast_to(y, (n, *batch))
    pfull = jnp.broadcast_to(ctx.p_col, (n, *batch))
    xs = jnp.broadcast_to(x, (n, *batch))
    s0 = jnp.zeros((n, *batch), dtype=U32)
    zero_row = jnp.zeros((1, *batch), dtype=U32)
    zero_rest = jnp.zeros((n - 1, *batch), dtype=U32)

    def body(s, xi):
        t = s[0] + xi * yfull[0]
        qi = (n0 * (t & mask)) & mask
        c = (t + qi * pfull[0]) >> w
        # s_new[j] = s[j+1] + x_i*y[j+1] + qi*p[j+1] for j < n-1 (+c at j=0)
        prod = xi[None] * yfull + qi[None] * pfull
        c_pad = jnp.concatenate([c[None], zero_rest], axis=0)
        s2 = jnp.concatenate([s[1:] + prod[1:], zero_row], axis=0) + c_pad
        if fold_every_step:
            s2 = (s2 & mask) + _shift_up(s2 >> w)
        return s2, None

    if ctx.unroll_mont:
        # Straight-line variant for Pallas kernel bodies: no lax.scan (its
        # per-step xs slicing is dynamic_slice, unsupported by Mosaic) and
        # strictly 2-D intermediates (row slices, not scalar indexing).
        s = s0
        for i in range(n):
            xi = xs[i : i + 1]  # (1, batch)
            t = s[0:1] + xi * yfull[0:1]
            qi = (n0 * (t & mask)) & mask
            c = (t + qi * pfull[0:1]) >> w
            prod = xi * yfull + qi * pfull
            c_pad = jnp.concatenate([c, zero_rest], axis=0)
            s = jnp.concatenate([s[1:] + prod[1:], zero_row], axis=0) + c_pad
            if fold_every_step:
                s = (s & mask) + _shift_up(s >> w)
    else:
        s, _ = jax.lax.scan(body, s0, xs, unroll=unroll)

    # final carry sweep (mont_pro_product.template.wgsl:52-57)
    if lazy:
        # lazy domain: REDC's sum is already < p*(1 + bound(x)*bound(y)
        # * p/R); callers track bounds and canonicalize once at stage
        # end.  Soft resolve: limbs <= soft_limb_max, no carry prefix.
        s, _ = resolve_carries(ctx, s, value_bits=32, soft=True)
        return s
    s, _ = resolve_carries(ctx, s, value_bits=32)
    return cond_reduce(ctx, s)


def mont_mul_pair(
    ctx: FieldCtx,
    a: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    d: jnp.ndarray,
) -> jnp.ndarray:
    """REDC(a*b + c*d): one shared Montgomery reduction for a sum of two
    products — the delayed-reduction trick for the point formulas' paired
    terms (X3/Y3/Z3 of RCB each combine two products; curve.py).

    Two interleaved mont_muls plus a lazy_add cost 120 limb-row
    multiplies, 180+ adds and 3 carry resolves; this form costs 90
    multiplies (60 product + 30 reduction), ~130 adds and 1 resolve —
    a 25% multiply / 30% add saving on every paired product.

    Split-phase schedule (product accumulation, one carry fold, then a
    separated REDC sweep), all in the carry-free column representation:

    - product phase: 2n steps of a_i*b + c_i*d into a sliding n-row
      window; column i is complete after step i and is emitted.  Peak
      column sum = 2n*(2^w-1)^2 terms (w=13, n=30: 4.026e9 < 2^32).
    - one fold pass squashes all 2n columns to < 2^w + 2^(32-w), making
      room for the reduction's additions.
    - REDC sweep: per column i, the quotient digit qi = n0*T[i] mod 2^w
      and qi*p accumulate into the window exactly as in mont_mul, with
      the finished low column's carry chained up; after n steps the
      window holds (T + m*p)/R.

    Lazy domain only (limbs canonical, values tracked by the caller):
    output < p*(1 + bound(a)*bound(b)/8192 + bound(c)*bound(d)/8192),
    so any bound-product sum <= 8192 keeps outputs < 2p.  For a
    DIFFERENCE a*b - c*d, negate one operand first with lazy_neg.
    Unrolled (Pallas kernel) form only — the straight-line structure
    mirrors mont_mul's Mosaic-safe patterns (2-D rows, slice+concat,
    no scans).
    """
    w, mask = ctx.word_size, ctx.mask
    n = ctx.num_words
    n0 = jnp.uint32(ctx.params.n0)
    lmax = soft_limb_max(w) if _soft_on() else (2**w - 1)
    assert 2 * n * lmax * lmax < 2**32, (
        f"pair-REDC column sums overflow u32 at word_size={w}: "
        f"2n*L^2 = {2 * n * lmax * lmax}"
    )

    batch = jnp.broadcast_shapes(
        a.shape[1:], b.shape[1:], c.shape[1:], d.shape[1:]
    )
    af = jnp.broadcast_to(a, (n, *batch))
    bf = jnp.broadcast_to(b, (n, *batch))
    cf = jnp.broadcast_to(c, (n, *batch))
    df = jnp.broadcast_to(d, (n, *batch))
    pfull = jnp.broadcast_to(ctx.p_col, (n, *batch))
    zero_row = jnp.zeros((1, *batch), dtype=U32)
    zero_rest = jnp.zeros((n - 1, *batch), dtype=U32)

    # -- product phase: T = a*b + c*d over 2n columns ----------------------
    acc = jnp.zeros((n, *batch), dtype=U32)
    lows = []
    for i in range(n):
        acc = acc + af[i : i + 1] * bf + cf[i : i + 1] * df
        lows.append(acc[0:1])  # column i is complete
        acc = jnp.concatenate([acc[1:], zero_row], axis=0)
    t = jnp.concatenate([*lows, acc], axis=0)  # (2n, batch) columns of T

    # -- fold: columns < 2^w + 2^(32-w); top column is product-free (max
    # real column index is 2n-2), so no carry falls off --------------------
    t = (t & mask) + _shift_up(t >> w)

    # -- separated REDC sweep ----------------------------------------------
    w_acc = t[:n]
    highs = t[n:]
    for i in range(n):
        ti = w_acc[0:1]
        qi = (n0 * (ti & mask)) & mask
        carry = (ti + qi * pfull[0:1]) >> w
        prod = qi * pfull
        c_pad = jnp.concatenate([carry, zero_rest], axis=0)
        w_acc = (
            jnp.concatenate([w_acc[1:] + prod[1:], highs[i : i + 1]], axis=0)
            + c_pad
        )

    out, _ = resolve_carries(ctx, w_acc, value_bits=32)
    return out


def to_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a -> a*r mod p via a single Montgomery product with r^2.

    The reference enters Montgomery form with a Barrett field_mul(a, r)
    (convert_point_coords...template.wgsl:41-144); multiplying by r^2 under
    REDC computes the identical canonical value with one cheaper kernel.
    """
    return mont_mul(ctx, a, ctx.r2_col)


def from_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a -> a*r^-1 mod p (Montgomery exit; submission.ts:290-304)."""
    return mont_mul(ctx, a, ctx.one_col)


# ---------------------------------------------------------------------------
# Widening schoolbook multiply + vanilla Barrett (barrett.template.wgsl)
# ---------------------------------------------------------------------------


def wide_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook W x W -> 2W limb multiply (barrett.template.wgsl mul:20).

    Accumulates per-product low/high halves into a (2W, N) buffer — peak
    accumulator 2W * 2^w < 2^19, far inside uint32 — then one carry pass.
    """
    w, mask = ctx.word_size, ctx.mask
    n = a.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    res0 = jnp.zeros((2 * n, *batch), dtype=U32)
    bb = jnp.broadcast_to(b, (n, *batch))
    pad = jnp.zeros((n, *batch), dtype=U32)
    zeros1 = jnp.zeros((1, *batch), dtype=U32)

    # Rather than dynamic-slice updates per limb, shift the *accumulator*
    # down one limb each step: after step i the accumulator window is
    # aligned so that adding the a_i*b partial product at window offset 0
    # lands at offset i of the final result; the completed lowest limb is
    # emitted each step.  res_final[k] = sum_{i+j=k} a_i*b_j (lo/hi split).
    def body(res, ai):
        c = ai[None, ...] * bb
        lo = jnp.concatenate([c & mask, pad], axis=0)
        hi = jnp.concatenate([zeros1, c >> w, pad[1:]], axis=0)
        res = res + lo + hi
        out_limb = res[0]
        res = jnp.concatenate([res[1:], zeros1], axis=0)
        return res, out_limb

    aa = jnp.broadcast_to(a, (n, *batch))
    res, low_limbs = jax.lax.scan(body, res0, aa)
    # low_limbs: final limbs 0..n-1 (complete when emitted); res: n..3n-1,
    # of which only the first n carry data.  Peak accumulator 2n*2^w < 2^19.
    full = jnp.concatenate([low_limbs, res[:n]], axis=0)
    out, _ = resolve_carries(ctx, full, value_bits=w + 6)
    return out


def _get_higher_with_slack(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Approximate floor(a / 2^p_width) (barrett.template.wgsl:52)."""
    w, mask = ctx.word_size, ctx.mask
    n = ctx.num_words
    slack = ctx.params.slack
    hi = a[n : 2 * n]
    lo = a[n - 1 : 2 * n - 1]
    return ((hi << slack) + (lo >> (w - slack))) & mask


def barrett_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full a*b mod p via vanilla Barrett (barrett.template.wgsl field_mul:60).

    Kept for parity with the reference's stage-1 path and as an independent
    check on mont_mul: barrett_mul(a, one_mont) == to_mont(a).
    """
    n = ctx.num_words
    p_wide = jnp.concatenate([ctx.p_col, jnp.zeros_like(ctx.p_col)], axis=0)

    xy = wide_mul(ctx, a, b)
    xy_hi = _get_higher_with_slack(ctx, xy)
    l = wide_mul(ctx, xy_hi, ctx.mu_col)
    l_hi = _get_higher_with_slack(ctx, l)
    lp = wide_mul(ctx, l_hi, ctx.p_col)
    r_wide, _ = bigint_sub(ctx, xy, lp)

    reduced, underflow = bigint_sub(ctx, r_wide, p_wide)
    r_wide = jnp.where(underflow == 0, reduced, r_wide)
    return cond_reduce(ctx, r_wide[:n])
