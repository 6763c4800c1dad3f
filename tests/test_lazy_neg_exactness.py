"""Exactness of the soft-domain negation trick (ops/field.py:lazy_sub/neg).

In the soft-limb carry domain, ``lazy_neg(b, k*p)`` computes
``(k*p - K) mod 2^(W*w) + (K -limbwise- b)`` and relies on the soft
carry folds to drop BOTH implicit 2^(W*w) wraps.  The first fold always
drops one; the second is guaranteed only under one of two conditions
(derived in round 5, after a live counterexample in the tree SMVP's
both-affine pair path):

  rule 1 (limb margin): b's top limb <= a's top limb + margin(k), where
      margin(k) = col_top(k) + K_i - 2^(w+1); or
  rule 2 (value margin): a + k*p - b >= p  (so the leftover 2^(W*w)
      forces the post-fold top limb over 2^w).

A surviving wrap is ALWAYS harmless mod 2^(W*w), but any later
multiplication (mont_mul or mont_mul_pair) converts it into a wrong
result mod p (+operand after REDC).  Every production usage
(ops/curve.py) satisfies rule 1 or rule 2 with true value bounds; these
tests pin the behavior with adversarial operands so a regression in
resolve_carries / koff / column construction is caught.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.ops import curve as dcurve
from webgpu_msm_bls12_377_tpu.ops import field as F
from webgpu_msm_bls12_377_tpu.reference.limbs import to_words_le

pytestmark = pytest.mark.skipif(
    not F._soft_on(), reason="strict-limb mode: negation is exact by ~b"
)


def _col(ctx, v):
    return jnp.asarray(
        np.array(
            to_words_le(v, ctx.num_words, ctx.word_size), dtype=np.uint32
        )[:, None]
    )


def _val(ctx, arr):
    # NOT from_words_le_unchecked: soft limbs exceed word_size bits and
    # its OR-composition drops their overlap; sum with carries instead.
    return sum(
        int(x) << (ctx.word_size * i)
        for i, x in enumerate(np.asarray(arr)[:, 0])
    )


def _soft(ctx, v):
    """v as a SOFT-limb operand (the worst case for the fold margins):
    a lazy_add of two halves pushes limbs toward soft_limb_max."""
    h = v // 2
    return F.lazy_add(ctx, _col(ctx, h), _col(ctx, v - h))


@pytest.mark.parametrize("ops_cls", [dcurve.G1Ops, dcurve.EdwardsOps])
def test_production_neg_usages_exact(ops_cls, rng):
    """Every (k, bound(b)) pattern the curve formulas feed to lazy_neg
    is exact, including adversarial b near its true upper bound."""
    ops = ops_cls()
    ctx = ops.ctx
    p = ctx.params.p
    # (k, true upper bound of b in units of p) per production call site:
    # G1 add_mixed_lazy_pair t4n: k=6, t4 <= ~4.2p; G1 add_affine_lazy_pair
    # t4n: k=4, t4 <= 2p; Edwards double_lazy d: k=2, a <= ~1.04p.
    cases = {
        dcurve.G1Ops: [(6, 4.2), (4, 2.0)],
        dcurve.EdwardsOps: [(2, 1.04), (4, 2.04)],
    }[ops_cls]
    for k, bmax in cases:
        col = ops._kpsub.get(k)
        if col is None:
            col = F.lazy_sub_col(k * p, ctx.num_words, ctx.word_size)
        hi = int(bmax * p)
        vals = [rng.randrange(hi) for _ in range(32)]
        # adversarial: values at the top of the allowed range, where the
        # top limb peaks and k*p - b bottoms out
        vals += [hi - 1 - rng.randrange(1 << 40) for _ in range(32)]
        for v in vals:
            b = _soft(ctx, v)
            got = _val(ctx, F.lazy_neg(ctx, b, col))
            assert got == k * p - v, (k, v)


@pytest.mark.parametrize("ops_cls", [dcurve.G1Ops, dcurve.EdwardsOps])
def test_production_sub_usages_exact(ops_cls, rng):
    """lazy_sub call-site patterns: a + k*p - b exact for adversarial
    (a, b) within the formulas' true value envelopes."""
    ops = ops_cls()
    ctx = ops.ctx
    p = ctx.params.p
    # (k, amax, bmax) in units of p, covering ops/curve.py call sites
    # with their TRUE (r-class) bounds, not the loose ledger bounds.
    cases = {
        dcurve.G1Ops: [(4, 1.04, 2.1), (12, 1.04, 9.4), (2, 1.04, 1.04),
                       (6, 1.04, 3.2), (18, 1.04, 9.4)],
        dcurve.EdwardsOps: [(4, 1.04, 2.1), (2, 2.04, 1.04)],
    }[ops_cls]
    for k, amax, bmax in cases:
        col = ops._kpsub.get(k)
        if col is None:
            col = F.lazy_sub_col(k * p, ctx.num_words, ctx.word_size)
        for _ in range(48):
            va = rng.randrange(int(amax * p))
            vb = rng.randrange(int(bmax * p))
            if rng.random() < 0.5:  # adversarial: small a, near-max b
                va = rng.randrange(1 << 40)
                vb = int(bmax * p) - 1 - rng.randrange(1 << 40)
            a = _soft(ctx, va)
            b = _soft(ctx, vb)
            got = _val(ctx, F.lazy_sub(ctx, a, b, col))
            assert got == va + k * p - vb, (k, va, vb)


def test_unsafe_pattern_detected(rng):
    """The round-5 counterexample class: k = bound(b) with b in
    ((k/2)p, kp) and a = 0 CAN leave a 2^(W*w) wrap (mod-2^(W*w) still
    correct).  Documents WHY the curve formulas pick k with a >= p
    margin; if resolve_carries ever starts clearing this, the guard
    rules can be relaxed."""
    ops = dcurve.G1Ops()
    ctx = ops.ctx
    p = ctx.params.p
    span = 1 << (ctx.num_words * ctx.word_size)
    wrapped = 0
    for _ in range(64):
        v = p + rng.randrange(p - (1 << 40))  # b in (p, 2p), top limb 1
        b = _soft(ctx, v)
        got = _val(ctx, F.lazy_neg(ctx, b, ops._kpsub[2]))
        assert (got - (2 * p - v)) % span == 0  # always exact mod 2^(W*w)
        if got != 2 * p - v:
            wrapped += 1
    # the pattern is genuinely unsafe: wraps must be observable here
    assert wrapped > 0
