"""Branch-free batched elliptic-curve kernels in the Montgomery domain.

TPU-native curve layer covering the reference's device curve code
(src/submission/implementation/wgsl/curve/ec_bls12_377.template.wgsl:13-80
and src/reference/webgpu/wgsl/Curve.ts:38-117):

- BLS12-377 G1 production path: **complete** projective short-Weierstrass
  formulas (Renes-Costello-Batina 2016, Algorithms 7-9 with a=0, b3=3b=3):
  add 12M, mixed add 11M, double 8M, exception-free on prime-order inputs
  — identity, doubling and inverse lanes all run the same straight-line
  code, so the SIMD kernels need no selects at all.  The reference's
  unified add-2002-bj (16M) / dbl-2007-bl are kept as `add_bj` /
  `add_mixed_bj` / `double_bl` for differential parity.
- Twisted Edwards extended ops — complete unified add/dbl-2008-hwcd
  (a = -1, d non-square), the formulas behind the reference's
  FieldMath/@noble oracle (src/reference/utils/FieldMath.ts:104-137).

Design notes:

* A batch of points is a NamedTuple of (num_words, *batch) uint32 coord
  arrays (see ops/field.py for the limb layout).  NamedTuples are pytrees,
  so points flow through jit / lax.scan / shard_map directly.
* The WGSL originals take early-return branches on the point at infinity
  (ec_bls12_377.template.wgsl:17-22); branches don't vectorize on a VPU.
  Complete formulas beat per-lane selects twice over: fewer multiplies
  AND no select traffic.
* Mixed (projective + affine) variants exploit z2 == 1: in Montgomery form
  "1" is r, and REDC(u * r) == u exactly, so the z2 products vanish
  bit-exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..params import EDWARDS_D, CurveId
from .field import (
    FieldCtx,
    lazy_sub_col,
    bigint_is_zero,
    field_add,
    field_canon,
    field_ctx,
    field_neg,
    field_sub,
    lazy_add,
    lazy_neg,
    lazy_scale,
    lazy_sub,
    lazy_triple,
    mont_mul,
    mont_mul_pair,
)


class ProjG1(NamedTuple):
    """(X : Y : Z) projective point batch; zero encoded as Z == 0."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class ExtEd(NamedTuple):
    """Extended twisted Edwards (X : Y : T : Z) batch, T = XY/Z."""

    x: jnp.ndarray
    y: jnp.ndarray
    t: jnp.ndarray
    z: jnp.ndarray


def select(mask: jnp.ndarray, a, b):
    """Lane-wise point select: a where mask else b.

    Accepts either a (batch,)-shaped mask or the module convention's
    (1, batch) row mask (ops/field.py).
    """
    m = mask if mask.ndim == a[0].ndim else mask[None, ...]
    return type(a)(*(jnp.where(m, ca, cb) for ca, cb in zip(a, b)))


# ---------------------------------------------------------------------------
# BLS12-377 G1 (short Weierstrass, a = 0, b = 1)
# ---------------------------------------------------------------------------


class G1Ops:
    """Batched G1 group ops over Montgomery-form limb vectors.

    Affine addends are (x, y) pairs with implicit z = 1 (= r in Montgomery
    form); accumulators are full projective ProjG1.
    """

    CURVE = CurveId.BLS12_377
    Point = ProjG1
    AFFINE_COORDS = 2

    #: k*p offsets used by add_mixed_lazy's lazy_subs (shipped as
    #: lazy_sub_col columns) and by canon's conditional subtracts (true
    #: k*p columns); all ride into Pallas kernels as inputs (captured
    #: array constants are illegal there —
    #: ops/pallas_kernels.py:_const_arrays/_rebuild_group)
    LAZY_KS = (2, 4, 6, 12, 18)
    CANON_KS = (2,)  # halving multiples field_canon visits for LAZY_BOUND
    #: extra (W, 1) constant columns shipped into Pallas kernels
    #: (ops/pallas_kernels.py ships/rebuilds these by attribute name):
    #: _three_mont = 3 in Montgomery form, the t2 = 3*Z1 constant of the
    #: both-affine RCB add (Z1 = 1)
    EXTRA_CONST_ATTRS = ("_three_mont",)

    def __init__(self, ctx: FieldCtx | None = None):
        self.ctx = ctx if ctx is not None else field_ctx(self.CURVE)
        p = self.ctx.params.p
        w, nw = self.ctx.params.word_size, self.ctx.params.num_words
        self._kp = {k: self.ctx.const(k * p) for k in self.CANON_KS}
        self._kpsub = {k: lazy_sub_col(k * p, nw, w) for k in self.LAZY_KS}
        self._three_mont = self.ctx.const((3 * self.ctx.params.r) % p)

    def zero(self, batch_shape: tuple[int, ...]) -> ProjG1:
        """The point at infinity (0 : 1 : 0), Montgomery form, broadcast."""
        ctx = self.ctx
        z = ctx.zeros(batch_shape)
        one = jnp.broadcast_to(ctx.one_mont_col, z.shape)
        return ProjG1(x=z, y=one, z=z)

    def is_zero(self, p: ProjG1) -> jnp.ndarray:
        return bigint_is_zero(p.z)

    def from_affine(self, aff: tuple[jnp.ndarray, jnp.ndarray]) -> ProjG1:
        x, y = aff
        one = jnp.broadcast_to(self.ctx.one_mont_col, x.shape)
        return ProjG1(x=x, y=y, z=one)

    def neg(self, p: ProjG1) -> ProjG1:
        """Lane-wise negation; infinity lanes pass through (bls12_377.ts:64)."""
        negated = ProjG1(x=p.x, y=field_neg(self.ctx, p.y), z=p.z)
        return select(self.is_zero(p), p, negated)

    def neg_affine(self, aff):
        x, y = aff
        return (x, field_neg(self.ctx, y))

    def _triple(self, v: jnp.ndarray) -> jnp.ndarray:
        """3*v (the b3 = 3b constant of RCB, b = 1): two field adds."""
        ctx = self.ctx
        return field_add(ctx, field_add(ctx, v, v), v)

    def add(self, p1: ProjG1, p2: ProjG1) -> ProjG1:
        """Complete projective addition (RCB 2016 Alg. 7, a=0, b3=3): 12M.

        Exception-free for prime-order inputs — identity, doubling and
        inverse lanes all take the same straight-line code, so no lane
        selects are needed (mirrors reference/curve.py:g1_add_rcb).
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        fa = lambda a, b: field_add(ctx, a, b)
        fs = lambda a, b: field_sub(ctx, a, b)
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        t0 = mm(X1, X2); t1 = mm(Y1, Y2); t2 = mm(Z1, Z2)
        t3 = fa(X1, Y1); t4 = fa(X2, Y2); t3 = mm(t3, t4)
        t4 = fa(t0, t1); t3 = fs(t3, t4); t4 = fa(Y1, Z1)
        X3 = fa(Y2, Z2); t4 = mm(t4, X3); X3 = fa(t1, t2)
        t4 = fs(t4, X3); X3 = fa(X1, Z1); Y3 = fa(X2, Z2)
        X3 = mm(X3, Y3); Y3 = fa(t0, t2); Y3 = fs(X3, Y3)
        X3 = fa(t0, t0); t0 = fa(X3, t0); t2 = self._triple(t2)
        Z3 = fa(t1, t2); t1 = fs(t1, t2); Y3 = self._triple(Y3)
        X3 = mm(t4, Y3); t2 = mm(t3, t1); X3 = fs(t2, X3)
        Y3 = mm(Y3, t0); t1 = mm(t1, Z3); Y3 = fa(t1, Y3)
        t0 = mm(t0, t3); Z3 = mm(Z3, t4); Z3 = fa(Z3, t0)
        return ProjG1(x=X3, y=Y3, z=Z3)

    def add_mixed(self, p1: ProjG1, aff) -> ProjG1:
        """Complete mixed addition (RCB 2016 Alg. 8, a=0, b3=3): 11M.

        The affine addend must not be the identity (bucket addends are
        table points); the accumulator may be anything including zero.
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        fa = lambda a, b: field_add(ctx, a, b)
        fs = lambda a, b: field_sub(ctx, a, b)
        X1, Y1, Z1 = p1
        X2, Y2 = aff
        t0 = mm(X1, X2); t1 = mm(Y1, Y2); t3 = fa(X2, Y2)
        t4 = fa(X1, Y1); t3 = mm(t3, t4); t4 = fa(t0, t1)
        t3 = fs(t3, t4); t4 = mm(Y2, Z1); t4 = fa(t4, Y1)
        Y3 = mm(X2, Z1); Y3 = fa(Y3, X1); X3 = fa(t0, t0)
        t0 = fa(X3, t0); t2 = self._triple(Z1); Z3 = fa(t1, t2)
        t1 = fs(t1, t2); Y3 = self._triple(Y3); X3 = mm(t4, Y3)
        t2 = mm(t3, t1); X3 = fs(t2, X3); Y3 = mm(Y3, t0)
        t1 = mm(t1, Z3); Y3 = fa(t1, Y3); t0 = mm(t0, t3)
        Z3 = mm(Z3, t4); Z3 = fa(Z3, t0)
        return ProjG1(x=X3, y=Y3, z=Z3)

    #: lazy-domain accumulator bound (coords < LAZY_BOUND * p); see
    #: add_mixed_lazy
    LAZY_BOUND = 4

    def add_mixed_lazy(self, p1: ProjG1, aff) -> ProjG1:
        """RCB mixed add in the lazy domain (ops/field.py): no per-op
        canonical reductions, ~25% fewer vector ops than add_mixed.

        Contract: accumulator coords < 4p (LAZY_BOUND), affine addend
        canonical (< p); outputs again < 4p.  Bound bookkeeping below is
        in units of p ("b<=k" means value < k*p); every Montgomery input
        pair satisfies bound(a)*bound(b) <= 2^13/2 = 4096, so REDC
        outputs stay < p*(1 + 4096/8192) < 2p, and raw magnitudes peak at
        14p < 2^381 << 2^390 = limb capacity.  Semantics checked against
        add_mixed in tests (mod p) and by the stream-kernel differential
        tests; canonicalize with canon() at stage end.
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1, Z1 = p1  # b<=4 each
        X2, Y2 = aff  # b<=1
        t0 = mm(X1, X2)               # 4*1      -> b<=2
        t1 = mm(Y1, Y2)               # 4*1      -> b<=2
        t3 = fa(X2, Y2)               # b<=2
        t4 = fa(X1, Y1)               # b<=8
        t3 = mm(t3, t4)               # 2*8=16   -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])  # b<=6
        t4 = mm(Y2, Z1)               # 1*4      -> b<=2
        t4 = fa(t4, Y1)               # b<=6
        Y3 = mm(X2, Z1)               # 1*4      -> b<=2
        Y3 = fa(Y3, X1)               # b<=6
        t0 = lazy_triple(ctx, t0)     # RCB's fa(fa(t0,t0),t0): one carry
        #                               pass instead of two; b<=6
        t2 = lazy_triple(ctx, Z1)     # b<=12
        Z3 = fa(t1, t2)               # b<=14
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[12])  # b<=14
        Y3 = lazy_triple(ctx, Y3)     # b<=18... see below
        # Y3 b<=18 exceeds the 4096-product budget with t4 b<=6 (108 ok)
        X3 = mm(t4, Y3)               # 6*18=108  -> b<=2
        t2 = mm(t3, t1)               # 6*14=84   -> b<=2
        X3 = lazy_sub(ctx, t2, X3, self._kpsub[2])  # b<=4
        Y3 = mm(Y3, t0)               # 18*6=108  -> b<=2
        t1 = mm(t1, Z3)               # 14*14=196 -> b<=2
        Y3 = fa(t1, Y3)               # b<=4
        t0 = mm(t0, t3)               # 6*6=36    -> b<=2
        Z3 = mm(Z3, t4)               # 14*6=84   -> b<=2
        Z3 = fa(Z3, t0)               # b<=4
        return ProjG1(x=X3, y=Y3, z=Z3)

    def add_mixed_lazy_pair(self, p1: ProjG1, aff) -> ProjG1:
        """add_mixed_lazy with the three paired products reduced once.

        RCB's X3/Y3/Z3 are each a sum/difference of two products; a
        shared reduction (field.py:mont_mul_pair) costs 75% of the
        multiplies and 70% of the adds of two interleaved mont_muls,
        and Y3/Z3 also lose their final carry pass (the pair absorbs
        the lazy_add).  Same contract as add_mixed_lazy: accumulator
        < 4p, affine addend canonical; outputs < 2p.  Bound products
        stay <= 304 << 8192, so every REDC output is < 2p.  Kernel
        (unrolled) form only — non-kernel callers keep add_mixed_lazy.
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        mmp = lambda a, b, c, d: mont_mul_pair(ctx, a, b, c, d)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1, Z1 = p1  # b<=4 each
        X2, Y2 = aff  # b<=1
        t0 = mm(X1, X2)               # 4*1      -> b<=2
        t1 = mm(Y1, Y2)               # 4*1      -> b<=2
        t3 = fa(X2, Y2)               # b<=2
        t4 = fa(X1, Y1)               # b<=8
        t3 = mm(t3, t4)               # 2*8=16   -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])  # b<=6
        t4 = mm(Y2, Z1)               # 1*4      -> b<=2
        t4 = fa(t4, Y1)               # b<=6
        Y3 = mm(X2, Z1)               # 1*4      -> b<=2
        Y3 = fa(Y3, X1)               # b<=6
        t0 = lazy_triple(ctx, t0)     # b<=6
        t2 = lazy_triple(ctx, Z1)     # b<=12
        Z3 = fa(t1, t2)               # b<=14
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[12])  # b<=14
        Y3 = lazy_triple(ctx, Y3)     # b<=18
        t4n = lazy_neg(ctx, t4, self._kpsub[6])      # 6p - t4; b<=6
        # X3 = t3*t1 - t4*Y3, Y3 = t1*Z3 + Y3*t0, Z3 = Z3*t4 + t0*t3
        X3 = mmp(t3, t1, t4n, Y3)     # 6*14 + 6*18 = 192  -> b<=2
        Y3n = mmp(t1, Z3, Y3, t0)     # 14*14 + 18*6 = 304 -> b<=2
        Z3 = mmp(Z3, t4, t0, t3)      # 14*6 + 6*6 = 120   -> b<=2
        return ProjG1(x=X3, y=Y3n, z=Z3)

    def add_affine_lazy(self, aff1, aff2) -> ProjG1:
        """Both-affine RCB add (Alg. 8 with Z1 = 1) in the lazy domain: 9M.

        The packed-tree SMVP's level-1 primitive (ops/smvp_tree.py): half
        of all tree adds combine two table points, where Z1 = 1 makes
        t4 = Y2*Z1 + Y1 and Y3 = X2*Z1 + X1 multiply-free and
        t2 = 3*Z1 a cheap constant triple — 9M vs the 11M mixed add.
        Contract: both addends canonical (< p); outputs < 4p
        (LAZY_BOUND).  Bounds in units of p as comments.
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1 = aff1  # b<=1
        X2, Y2 = aff2  # b<=1
        # t2 = 3*Z1 = 3 in Montgomery form (reduced mod p, so b<=1), a
        # shipped constant column (EXTRA_CONST_ATTRS): computing
        # lazy_triple(one) in-kernel crashes the Mosaic compiler
        # (arithmetic through the carry folds on a lane-broadcast (W, 1)
        # block), and array-valued inline constants are rejected by
        # pallas_call.
        t2 = self._three_mont
        t0 = mm(X1, X2)               # 1*1      -> b<=2
        t1 = mm(Y1, Y2)               # 1*1      -> b<=2
        t3 = fa(X2, Y2)               # b<=2
        t4 = fa(X1, Y1)               # b<=2
        t3 = mm(t3, t4)               # 2*2=4    -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])  # b<=6
        t4 = fa(Y2, Y1)               # Y2*Z1 + Y1, Z1 = 1; b<=2
        Y3 = fa(X2, X1)               # X2*Z1 + X1; b<=2
        t0 = lazy_triple(ctx, t0)     # b<=6
        Z3 = fa(t1, t2)               # b<=3
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[2])  # 2p-t2 >= p: exact; b<=4
        Y3 = lazy_triple(ctx, Y3)     # b<=6
        X3 = mm(t4, Y3)               # 2*6=12    -> b<=2
        t2 = mm(t3, t1)               # 6*4=24    -> b<=2
        X3 = lazy_sub(ctx, t2, X3, self._kpsub[2])  # b<=4
        Y3 = mm(Y3, t0)               # 6*6=36    -> b<=2
        t1 = mm(t1, Z3)               # 4*3=12    -> b<=2
        Y3 = fa(t1, Y3)               # b<=4
        t0 = mm(t0, t3)               # 6*6=36    -> b<=2
        Z3 = mm(Z3, t4)               # 3*2=6     -> b<=2
        Z3 = fa(Z3, t0)               # b<=4
        return ProjG1(x=X3, y=Y3, z=Z3)

    def add_affine_lazy_pair(self, aff1, aff2) -> ProjG1:
        """add_affine_lazy with the three paired products reduced once
        (field.py:mont_mul_pair), mirroring add_mixed_lazy_pair: ~25%
        fewer multiply rows on the final six products.  Same contract:
        canonical addends, outputs < 4p.  Bound products peak at 66
        << 8192.  Kernel (unrolled) form only."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        mmp = lambda a, b, c, d: mont_mul_pair(ctx, a, b, c, d)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1 = aff1  # b<=1
        X2, Y2 = aff2  # b<=1
        t2 = self._three_mont     # 3*Z1 = 3 in Montgomery form; b<=1
        t0 = mm(X1, X2)               # -> b<=2
        t1 = mm(Y1, Y2)               # -> b<=2
        t3 = fa(X2, Y2)               # b<=2
        t4 = fa(X1, Y1)               # b<=2
        t3 = mm(t3, t4)               # 4  -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])  # b<=6
        t4 = fa(Y2, Y1)               # b<=2
        Y3 = fa(X2, X1)               # b<=2
        t0 = lazy_triple(ctx, t0)     # b<=6
        Z3 = fa(t1, t2)               # b<=3
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[2])  # 2p-t2 >= p; b<=4
        Y3 = lazy_triple(ctx, Y3)     # b<=6
        # k = 4, NOT bound(t4) = 2: the soft-domain negation is exact only
        # when k*p - b >= p (else a 2^(W*w) wrap can survive the soft
        # folds and pair-REDC turns it into a +Y3 error; see
        # tests/test_lazy_neg_exactness.py).  t4 <= 2p ==> 4p - t4 >= 2p.
        t4n = lazy_neg(ctx, t4, self._kpsub[4])     # 4p - t4; b<=4
        # X3 = t3*t1 - t4*Y3, Y3 = t1*Z3 + Y3*t0, Z3 = Z3*t4 + t0*t3
        X3 = mmp(t3, t1, t4n, Y3)     # 6*4 + 4*6 = 48  -> b<=2
        Y3n = mmp(t1, Z3, Y3, t0)     # 4*3 + 6*6 = 48  -> b<=2
        Z3 = mmp(Z3, t4, t0, t3)      # 3*2 + 6*6 = 42  -> b<=2
        return ProjG1(x=X3, y=Y3n, z=Z3)

    def add_lazy(self, p1: ProjG1, p2: ProjG1) -> ProjG1:
        """Complete projective add (RCB Alg. 7) in the lazy domain.

        Contract: both inputs < 4p (LAZY_BOUND); outputs < 4p — closed
        under chaining, so running-sum scans (ops/bpr.py) stay lazy for
        their whole trip count and canonicalize once at the end.  Bound
        products peak at 108 << 8192 (comments in units of p)."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1, Z1 = p1  # b<=4 each
        X2, Y2, Z2 = p2  # b<=4 each
        t0 = mm(X1, X2)               # 16   -> b<=2
        t1 = mm(Y1, Y2)               # 16   -> b<=2
        t2 = mm(Z1, Z2)               # 16   -> b<=2
        t3 = fa(X1, Y1)               # b<=8
        t4 = fa(X2, Y2)               # b<=8
        t3 = mm(t3, t4)               # 64   -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])   # b<=6
        t4 = fa(Y1, Z1)               # b<=8
        X3 = fa(Y2, Z2)               # b<=8
        t4 = mm(t4, X3)               # 64   -> b<=2
        X3 = fa(t1, t2)               # b<=4
        t4 = lazy_sub(ctx, t4, X3, self._kpsub[4])   # b<=6
        X3 = fa(X1, Z1)               # b<=8
        Y3 = fa(X2, Z2)               # b<=8
        X3 = mm(X3, Y3)               # 64   -> b<=2
        Y3 = fa(t0, t2)               # b<=4
        Y3 = lazy_sub(ctx, X3, Y3, self._kpsub[4])   # b<=6
        t0 = lazy_triple(ctx, t0)     # b<=6
        t2 = lazy_triple(ctx, t2)     # b<=6
        Z3 = fa(t1, t2)               # b<=8
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[6])   # b<=8
        Y3 = lazy_triple(ctx, Y3)     # b<=18
        X3 = mm(t4, Y3)               # 6*18=108 -> b<=2
        t2 = mm(t3, t1)               # 6*8=48   -> b<=2
        X3 = lazy_sub(ctx, t2, X3, self._kpsub[2])   # b<=4
        Y3 = mm(Y3, t0)               # 18*6=108 -> b<=2
        t1 = mm(t1, Z3)               # 8*8=64   -> b<=2
        Y3 = fa(t1, Y3)               # b<=4
        t0 = mm(t0, t3)               # 6*6=36   -> b<=2
        Z3 = mm(Z3, t4)               # 8*6=48   -> b<=2
        Z3 = fa(Z3, t0)               # b<=4
        return ProjG1(x=X3, y=Y3, z=Z3)

    def add_lazy_pair(self, p1: ProjG1, p2: ProjG1) -> ProjG1:
        """add_lazy with the three paired products reduced once
        (field.py:mont_mul_pair), mirroring add_mixed_lazy_pair: the
        last six of RCB's twelve products pair into X3/Y3/Z3 sums, so
        this form runs 6 muls + 3 pair-REDCs (~12.5% fewer multiply
        rows) and the pairs absorb the three final lazy folds.  Same
        contract as add_lazy: inputs < 4p, outputs < 4p (every pair's
        bound product sum <= 264 << 8192, REDC outputs < 2p).  Kernel
        (unrolled) form only — non-kernel callers keep add_lazy."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        mmp = lambda a, b, c, d: mont_mul_pair(ctx, a, b, c, d)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X1, Y1, Z1 = p1  # b<=4 each
        X2, Y2, Z2 = p2  # b<=4 each
        t0 = mm(X1, X2)               # 16   -> b<=2
        t1 = mm(Y1, Y2)               # 16   -> b<=2
        t2 = mm(Z1, Z2)               # 16   -> b<=2
        t3 = fa(X1, Y1)               # b<=8
        t4 = fa(X2, Y2)               # b<=8
        t3 = mm(t3, t4)               # 64   -> b<=2
        t4 = fa(t0, t1)               # b<=4
        t3 = lazy_sub(ctx, t3, t4, self._kpsub[4])   # b<=6
        t4 = fa(Y1, Z1)               # b<=8
        X3 = fa(Y2, Z2)               # b<=8
        t4 = mm(t4, X3)               # 64   -> b<=2
        X3 = fa(t1, t2)               # b<=4
        t4 = lazy_sub(ctx, t4, X3, self._kpsub[4])   # b<=6
        X3 = fa(X1, Z1)               # b<=8
        Y3 = fa(X2, Z2)               # b<=8
        X3 = mm(X3, Y3)               # 64   -> b<=2
        Y3 = fa(t0, t2)               # b<=4
        Y3 = lazy_sub(ctx, X3, Y3, self._kpsub[4])   # b<=6
        t0 = lazy_triple(ctx, t0)     # b<=6
        t2 = lazy_triple(ctx, t2)     # b<=6
        Z3 = fa(t1, t2)               # b<=8
        t1 = lazy_sub(ctx, t1, t2, self._kpsub[6])   # b<=8
        Y3 = lazy_triple(ctx, Y3)     # b<=18
        # k = 12 (not bound(t4) = 6): soft-domain negation is exact only
        # when k*p - b >= p, and t4 <= 6p needs k >= 7; 12 is the
        # smallest precomputed LAZY_KS member above it (see
        # tests/test_lazy_neg_exactness.py for the failure mode)
        t4n = lazy_neg(ctx, t4, self._kpsub[12])     # 12p - t4; b<=12
        # X3 = t3*t1 - t4*Y3, Y3 = Y3*t0 + t1*Z3, Z3 = Z3*t4 + t0*t3
        X3 = mmp(t3, t1, t4n, Y3)     # 6*8 + 12*18 = 264 -> b<=2
        Y3n = mmp(t1, Z3, Y3, t0)     # 8*8 + 18*6 = 172  -> b<=2
        Z3 = mmp(Z3, t4, t0, t3)      # 8*6 + 6*6 = 84    -> b<=2
        return ProjG1(x=X3, y=Y3n, z=Z3)

    def double_lazy(self, p1: ProjG1) -> ProjG1:
        """Complete doubling (RCB Alg. 9) in the lazy domain.

        Contract: input < 4p; outputs < 4p (closed).  Bound products peak
        at 160 << 8192."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b, lazy=True)
        fa = lambda a, b: lazy_add(ctx, a, b)
        X, Y, Z = p1  # b<=4
        t0 = mm(Y, Y)                 # 16   -> b<=2
        Z3 = lazy_scale(ctx, t0, 8)   # b<=16
        t1 = mm(Y, Z)                 # 16   -> b<=2
        t2 = mm(Z, Z)                 # 16   -> b<=2
        t2 = lazy_triple(ctx, t2)     # b<=6
        X3 = mm(t2, Z3)               # 6*16=96 -> b<=2
        Y3 = fa(t0, t2)               # b<=8
        Z3 = mm(t1, Z3)               # 2*16=32 -> b<=2
        t2 = lazy_triple(ctx, t2)     # b<=18  (RCB's t1=2*t2; t2=t1+t2)
        t0 = lazy_sub(ctx, t0, t2, self._kpsub[18])  # b<=20
        Y3 = mm(t0, Y3)               # 20*8=160 -> b<=2
        Y3 = fa(X3, Y3)               # b<=4
        t1 = mm(X, Y)                 # 16   -> b<=2
        X3 = mm(t0, t1)               # 20*2=40  -> b<=2
        X3 = fa(X3, X3)               # b<=4
        return ProjG1(x=X3, y=Y3, z=Z3)

    def canon(self, p: ProjG1) -> ProjG1:
        """Lazy-domain point -> canonical coords (< p)."""
        ctx = self.ctx
        return ProjG1(
            *(field_canon(ctx, c, self.LAZY_BOUND, self._kp) for c in p)
        )

    def double(self, p: ProjG1) -> ProjG1:
        """Complete doubling (RCB 2016 Alg. 9, a=0, b3=3): 8M."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        fa = lambda a, b: field_add(ctx, a, b)
        fs = lambda a, b: field_sub(ctx, a, b)
        X, Y, Z = p
        t0 = mm(Y, Y); Z3 = fa(t0, t0); Z3 = fa(Z3, Z3)
        Z3 = fa(Z3, Z3); t1 = mm(Y, Z); t2 = mm(Z, Z)
        t2 = self._triple(t2); X3 = mm(t2, Z3); Y3 = fa(t0, t2)
        Z3 = mm(t1, Z3); t1 = fa(t2, t2); t2 = fa(t1, t2)
        t0 = fs(t0, t2); Y3 = mm(t0, Y3); Y3 = fa(X3, Y3)
        t1 = mm(X, Y); X3 = mm(t0, t1); X3 = fa(X3, X3)
        return ProjG1(x=X3, y=Y3, z=Z3)

    # -- legacy unified formulas (reference parity: add-2002-bj/dbl-2007-bl)

    def _add_core(self, p1: ProjG1, u1, s1, zz, p2: ProjG1) -> ProjG1:
        """Shared tail of add/add_mixed (ec_bls12_377.template.wgsl:24-52)."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        u2 = mm(p2.x, p1.z)
        s2 = mm(p2.y, p1.z)
        t = field_add(ctx, u1, u2)
        m = field_add(ctx, s1, s2)
        u1u2 = mm(u1, u2)
        tt = mm(t, t)
        r = field_sub(ctx, tt, u1u2)  # a == 0: no a*ZZ^2 term
        f = mm(zz, m)
        l = mm(m, f)
        g = mm(t, l)
        rr = mm(r, r)
        w = field_sub(ctx, rr, g)
        fw = mm(f, w)
        x3 = field_add(ctx, fw, fw)
        w2 = field_add(ctx, w, w)
        gw2 = field_sub(ctx, g, w2)
        rgw2 = mm(r, gw2)
        ll = mm(l, l)
        y3 = field_sub(ctx, rgw2, ll)
        ff = mm(f, f)
        fff = mm(ff, f)
        z3 = field_add(ctx, fff, fff)
        return ProjG1(x=x3, y=y3, z=z3)

    def add_bj(self, p1: ProjG1, p2: ProjG1) -> ProjG1:
        """Unified projective add-2002-bj with infinity selects (16M) —
        the reference's formula (ec_bls12_377.template.wgsl:13-52), kept
        for differential parity tests; the RCB complete add above is the
        production path."""
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        u1 = mm(p1.x, p2.z)
        s1 = mm(p1.y, p2.z)
        zz = mm(p1.z, p2.z)
        res = self._add_core(p1, u1, s1, zz, p2)
        res = select(self.is_zero(p2), p1, res)
        return select(self.is_zero(p1), p2, res)

    def add_mixed_bj(self, p1: ProjG1, aff) -> ProjG1:
        """p1 + (x2, y2, z2=1): 13M. Bit-identical to add_bj with z2=one."""
        x2, y2 = aff
        p2 = self.from_affine((x2, y2))
        res = self._add_core(p1, p1.x, p1.y, p1.z, p2)
        return select(self.is_zero(p1), p2, res)

    def double_bl(self, p1: ProjG1) -> ProjG1:
        """dbl-2007-bl with a = 0 (ec_bls12_377.template.wgsl:55-80).

        Infinity maps to z3 = 0 by itself (s = 2*y*z = 0), no select needed.
        """
        ctx = self.ctx
        mm = lambda a, b: mont_mul(ctx, a, b)
        xx = mm(p1.x, p1.x)
        w = field_add(ctx, field_add(ctx, xx, xx), xx)
        y1z1 = mm(p1.y, p1.z)
        s = field_add(ctx, y1z1, y1z1)
        ss = mm(s, s)
        sss = mm(ss, s)
        r = mm(p1.y, s)
        rr = mm(r, r)
        x1r = field_add(ctx, p1.x, r)
        x1rx1r = mm(x1r, x1r)
        b = field_sub(ctx, field_sub(ctx, x1rx1r, xx), rr)
        ww = mm(w, w)
        b2 = field_add(ctx, b, b)
        h = field_sub(ctx, ww, b2)
        x3 = mm(h, s)
        bh = field_sub(ctx, b, h)
        wbh = mm(w, bh)
        rr2 = field_add(ctx, rr, rr)
        y3 = field_sub(ctx, wbh, rr2)
        return ProjG1(x=x3, y=y3, z=sss)


# ---------------------------------------------------------------------------
# Twisted Edwards BLS12 (a = -1, d = 3021): complete formulas
# ---------------------------------------------------------------------------


class EdwardsOps:
    """Batched extended twisted-Edwards group ops, Montgomery form.

    Affine addends are (x, y, t=x*y) triples with implicit z = 1.
    The unified 2008-hwcd formulas are complete for a = -1 with d a
    non-square, so identity/equal/inverse lanes need no selects.
    """

    CURVE = CurveId.EDWARDS_BLS12
    Point = ExtEd
    AFFINE_COORDS = 3

    LAZY_KS = (2, 4)  # see G1Ops.LAZY_KS
    CANON_KS = ()  # LAZY_BOUND = 2: canon is just the final field_reduce

    def __init__(self, ctx: FieldCtx | None = None):
        self.ctx = ctx if ctx is not None else field_ctx(self.CURVE)
        self.d_mont_col = self.ctx.const(
            (EDWARDS_D * self.ctx.params.r) % self.ctx.params.p
        )
        p = self.ctx.params.p
        w, nw = self.ctx.params.word_size, self.ctx.params.num_words
        self._kp = {k: self.ctx.const(k * p) for k in self.CANON_KS}
        self._kpsub = {k: lazy_sub_col(k * p, nw, w) for k in self.LAZY_KS}

    def zero(self, batch_shape: tuple[int, ...]) -> ExtEd:
        ctx = self.ctx
        z = ctx.zeros(batch_shape)
        one = jnp.broadcast_to(ctx.one_mont_col, z.shape)
        return ExtEd(x=z, y=one, t=z, z=one)

    def is_zero(self, p: ExtEd) -> jnp.ndarray:
        """Identity test x == 0 and y == z (projective)."""
        ctx = self.ctx
        return bigint_is_zero(p.x) & bigint_is_zero(field_sub(ctx, p.y, p.z))

    def from_affine(self, aff) -> ExtEd:
        x, y, t = aff
        one = jnp.broadcast_to(self.ctx.one_mont_col, x.shape)
        return ExtEd(x=x, y=y, t=t, z=one)

    def neg(self, p: ExtEd) -> ExtEd:
        ctx = self.ctx
        return ExtEd(
            x=field_neg(ctx, p.x), y=p.y, t=field_neg(ctx, p.t), z=p.z
        )

    def neg_affine(self, aff):
        x, y, t = aff
        ctx = self.ctx
        return (field_neg(ctx, x), y, field_neg(ctx, t))

    def _add_core(self, p1: ExtEd, p2: ExtEd, dd) -> ExtEd:
        """add-2008-hwcd with a = -1 folded in (h = b + a-term)."""
        ctx = self.ctx
        mm = lambda u, v: mont_mul(ctx, u, v)
        a = mm(p1.x, p2.x)
        b = mm(p1.y, p2.y)
        t1t2 = mm(p1.t, p2.t)
        c = mm(self.d_mont_col, t1t2)
        x1y1 = field_add(ctx, p1.x, p1.y)
        x2y2 = field_add(ctx, p2.x, p2.y)
        e = field_sub(ctx, field_sub(ctx, mm(x1y1, x2y2), a), b)
        f = field_sub(ctx, dd, c)
        g = field_add(ctx, dd, c)
        h = field_add(ctx, b, a)  # b - (-1)*a
        return ExtEd(x=mm(e, f), y=mm(g, h), t=mm(e, h), z=mm(f, g))

    def add(self, p1: ExtEd, p2: ExtEd) -> ExtEd:
        dd = mont_mul(self.ctx, p1.z, p2.z)
        return self._add_core(p1, p2, dd)

    def add_mixed(self, p1: ExtEd, aff) -> ExtEd:
        """p1 + affine (z2 = 1): d-term is just z1. Bit-identical to add."""
        return self._add_core(p1, self.from_affine(aff), p1.z)

    #: lazy-domain accumulator bound; see G1Ops.add_mixed_lazy
    LAZY_BOUND = 2

    def add_mixed_lazy(self, p1: ExtEd, aff) -> ExtEd:
        """Unified hwcd mixed add in the lazy domain (ops/field.py).

        Contract: accumulator coords < 2p, affine addend canonical;
        outputs < 2p (every REDC input product bound <= 4096, outputs
        < 1.5p).  Bounds in units of p as comments.
        """
        ctx = self.ctx
        mm = lambda u, v: mont_mul(ctx, u, v, lazy=True)
        fa = lambda u, v: lazy_add(ctx, u, v)
        x2, y2, t2 = aff  # b<=1
        a = mm(p1.x, x2)              # 2*1     -> b<=2
        b = mm(p1.y, y2)              # b<=2
        t1t2 = mm(p1.t, t2)           # b<=2
        c = mm(self.d_mont_col, t1t2)  # 1*2    -> b<=2
        x1y1 = fa(p1.x, p1.y)         # b<=4
        x2y2 = fa(x2, y2)             # b<=2
        em = mm(x1y1, x2y2)           # 4*2=8   -> b<=2
        ab = fa(a, b)                 # b<=4
        e = lazy_sub(ctx, em, ab, self._kpsub[4])  # b<=6
        dd = p1.z                     # b<=2 (z2 = 1)
        f = lazy_sub(ctx, dd, c, self._kpsub[2])   # b<=4
        g = fa(dd, c)                 # b<=4
        h = fa(b, a)                  # b<=4
        return ExtEd(
            x=mm(e, f),               # 6*4=24  -> b<=2
            y=mm(g, h),               # 4*4=16  -> b<=2
            t=mm(e, h),               # 24      -> b<=2
            z=mm(f, g),               # 16      -> b<=2
        )

    def add_affine_lazy(self, aff1, aff2) -> ExtEd:
        """Both-affine hwcd add for the packed-tree SMVP's level 1.

        hwcd gains nothing special from Z1 = 1 beyond the mixed form
        (the d-term is z1 either way), so this is add_mixed_lazy seeded
        with the promoted first addend; kept as a named entry so the
        tree kernel builder is curve-agnostic (ops/smvp_tree.py)."""
        return self.add_mixed_lazy(self.from_affine(aff1), aff2)

    def add_lazy(self, p1: ExtEd, p2: ExtEd) -> ExtEd:
        """Unified hwcd full add in the lazy domain.

        Contract: both inputs < 2p; outputs < 2p (closed under chaining).
        Bound products peak at 24 << 8192."""
        ctx = self.ctx
        mm = lambda u, v: mont_mul(ctx, u, v, lazy=True)
        fa = lambda u, v: lazy_add(ctx, u, v)
        a = mm(p1.x, p2.x)            # 4      -> b<=2
        b = mm(p1.y, p2.y)            # 4      -> b<=2
        t1t2 = mm(p1.t, p2.t)         # 4      -> b<=2
        c = mm(self.d_mont_col, t1t2)  # 2     -> b<=2
        x1y1 = fa(p1.x, p1.y)         # b<=4
        x2y2 = fa(p2.x, p2.y)         # b<=4
        em = mm(x1y1, x2y2)           # 16     -> b<=2
        ab = fa(a, b)                 # b<=4
        e = lazy_sub(ctx, em, ab, self._kpsub[4])  # b<=6
        dd = mm(p1.z, p2.z)           # 4      -> b<=2
        f = lazy_sub(ctx, dd, c, self._kpsub[2])   # b<=4
        g = fa(dd, c)                 # b<=4
        h = fa(b, a)                  # b<=4
        return ExtEd(
            x=mm(e, f),               # 24 -> b<=2
            y=mm(g, h),               # 16 -> b<=2
            t=mm(e, h),               # 24 -> b<=2
            z=mm(f, g),               # 16 -> b<=2
        )

    def double_lazy(self, p1: ExtEd) -> ExtEd:
        """dbl-2008-hwcd (a = -1) in the lazy domain: inputs < 2p,
        outputs < 2p.  Bound products peak at 48 << 8192."""
        ctx = self.ctx
        mm = lambda u, v: mont_mul(ctx, u, v, lazy=True)
        fa = lambda u, v: lazy_add(ctx, u, v)
        a = mm(p1.x, p1.x)            # 4  -> b<=2
        b = mm(p1.y, p1.y)            # 4  -> b<=2
        zz = mm(p1.z, p1.z)           # 4  -> b<=2
        c = fa(zz, zz)                # b<=4
        d = lazy_neg(ctx, a, self._kpsub[2])        # b<=2
        xy = fa(p1.x, p1.y)           # b<=4
        e = mm(xy, xy)                # 16 -> b<=2
        e = lazy_sub(ctx, e, fa(a, b), self._kpsub[4])  # b<=6
        g = fa(d, b)                  # b<=4
        f = lazy_sub(ctx, g, c, self._kpsub[4])     # b<=8
        h = lazy_sub(ctx, d, b, self._kpsub[2])     # b<=4
        return ExtEd(
            x=mm(e, f),               # 48 -> b<=2
            y=mm(g, h),               # 16 -> b<=2
            t=mm(e, h),               # 24 -> b<=2
            z=mm(f, g),               # 32 -> b<=2
        )

    def canon(self, p: ExtEd) -> ExtEd:
        ctx = self.ctx
        return ExtEd(
            *(field_canon(ctx, c, self.LAZY_BOUND, self._kp) for c in p)
        )

    def double(self, p1: ExtEd) -> ExtEd:
        """dbl-2008-hwcd with a = -1 (d-term = -a)."""
        ctx = self.ctx
        mm = lambda u, v: mont_mul(ctx, u, v)
        a = mm(p1.x, p1.x)
        b = mm(p1.y, p1.y)
        zz = mm(p1.z, p1.z)
        c = field_add(ctx, zz, zz)
        d = field_neg(ctx, a)
        xy = field_add(ctx, p1.x, p1.y)
        e = field_sub(ctx, field_sub(ctx, mm(xy, xy), a), b)
        g = field_add(ctx, d, b)
        f = field_sub(ctx, g, c)
        h = field_sub(ctx, d, b)
        return ExtEd(x=mm(e, f), y=mm(g, h), t=mm(e, h), z=mm(f, g))


def group_ops(curve: CurveId):
    """Factory mirroring the reference's Curve enum dispatch."""
    if curve == CurveId.BLS12_377:
        return G1Ops()
    return EdwardsOps()
