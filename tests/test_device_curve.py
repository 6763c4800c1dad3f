"""Differential tests: device curve kernels vs the plain-bigint oracle.

The device runs the identical formula sequence in the Montgomery domain, so
after Montgomery exit the projective coordinate values must match the
oracle's plain-int coordinates exactly (not just as group elements).
"""

import functools

import jax
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.ops import curve as dcurve
from webgpu_msm_bls12_377_tpu.ops import field as dfield
from webgpu_msm_bls12_377_tpu.params import CurveId
from webgpu_msm_bls12_377_tpu.reference import curve as ocurve

from test_device_field import batch_to_device, device_to_ints, jop


@functools.lru_cache(maxsize=None)
def jmethod(kind, name):
    """Jitted group-op method (compile once per shape class)."""
    ops = dcurve.G1Ops() if kind == "g1" else dcurve.EdwardsOps()
    return jax.jit(getattr(ops, name))


def g1_batch_to_device(ops, points):
    """Oracle ProjectivePoints -> device ProjG1 in Montgomery form."""
    params = ops.ctx.params
    to_m = lambda v: (v * params.r) % params.p
    return dcurve.ProjG1(
        x=batch_to_device([to_m(p.x % params.p) for p in points], params),
        y=batch_to_device([to_m(p.y % params.p) for p in points], params),
        z=batch_to_device([to_m(p.z % params.p) for p in points], params),
    )


def g1_device_to_oracle(ops, pts):
    params = ops.ctx.params
    coords = [
        device_to_ints(jop(ops.CURVE, "from_mont")(c), params) for c in pts
    ]
    return [
        ocurve.ProjectivePoint(x, y, z) for x, y, z in zip(*coords)
    ]


def ed_batch_to_device(ops, points):
    params = ops.ctx.params
    to_m = lambda v: (v * params.r) % params.p
    return dcurve.ExtEd(
        x=batch_to_device([to_m(p.x % params.p) for p in points], params),
        y=batch_to_device([to_m(p.y % params.p) for p in points], params),
        t=batch_to_device([to_m(p.t % params.p) for p in points], params),
        z=batch_to_device([to_m(p.z % params.p) for p in points], params),
    )


def ed_device_to_oracle(ops, pts):
    params = ops.ctx.params
    coords = [
        device_to_ints(jop(ops.CURVE, "from_mont")(c), params) for c in pts
    ]
    return [ocurve.ExtendedPoint(*c) for c in zip(*coords)]


def rand_g1(rng, n):
    return [
        ocurve.g1_scalar_mult(ocurve.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]


def rand_ed(rng, n):
    return [
        ocurve.ed_scalar_mult(ocurve.ED_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]


def assert_proj_equal(got, want):
    for i, (g, w) in enumerate(zip(got, want)):
        assert (g.x, g.y, g.z) == (w.x, w.y, w.z), f"elem {i}"


class TestG1:
    def test_add_rcb_complete(self, rng):
        """Production complete add (RCB Alg. 7) limb-exact vs its oracle,
        including identity / doubling / inverse lanes (no exceptions)."""
        ops = dcurve.G1Ops()
        n = 8
        p1 = rand_g1(rng, n)
        p2 = rand_g1(rng, n)
        p1 += [ocurve.G1_ZERO, p1[0], p1[1], p1[2]]
        p2 += [p2[0], ocurve.G1_ZERO, ocurve.g1_neg(p1[1]), p1[2]]
        got = g1_device_to_oracle(
            ops, jmethod('g1', 'add')(g1_batch_to_device(ops, p1), g1_batch_to_device(ops, p2))
        )
        want = [ocurve.g1_add_rcb(a, b) for a, b in zip(p1, p2)]
        assert_proj_equal(got, want)
        # and as group elements vs the bj oracle
        for i, (g, w) in enumerate(
            zip(got, [ocurve.g1_add(a, b) for a, b in zip(p1, p2)])
        ):
            if w.is_zero():
                assert g.is_zero(), f"elem {i}"
            else:
                assert ocurve.g1_eq(g, w), f"elem {i}"

    def test_add_mixed_rcb(self, rng):
        ops = dcurve.G1Ops()
        n = 8
        acc = rand_g1(rng, n) + [ocurve.G1_ZERO, rand_g1(rng, 1)[0]]
        addend = rand_g1(rng, n + 1)
        addend.append(acc[-1])  # doubling lane
        aff = [ocurve.g1_to_affine(p) for p in addend]
        params = ops.ctx.params
        to_m = lambda v: (v * params.r) % params.p
        aff_dev = (
            batch_to_device([to_m(x) for x, _ in aff], params),
            batch_to_device([to_m(y) for _, y in aff], params),
        )
        got = g1_device_to_oracle(
            ops, jmethod('g1', 'add_mixed')(g1_batch_to_device(ops, acc), aff_dev)
        )
        want = [
            ocurve.g1_add_mixed_rcb(a, xy) for a, xy in zip(acc, aff)
        ]
        assert_proj_equal(got, want)

    def test_double_rcb(self, rng):
        ops = dcurve.G1Ops()
        pts = rand_g1(rng, 8) + [ocurve.G1_ZERO]
        got = g1_device_to_oracle(ops, jmethod('g1', 'double')(g1_batch_to_device(ops, pts)))
        want = [ocurve.g1_double_rcb(p) for p in pts]
        assert_proj_equal(got, want)

    @pytest.mark.slow  # suite budget: reference-parity forms, slow tier
    def test_legacy_bj_formulas(self, rng):
        """Reference-parity unified formulas (add-2002-bj / dbl-2007-bl)."""
        ops = dcurve.G1Ops()
        n = 6
        p1 = rand_g1(rng, n) + [ocurve.G1_ZERO, rand_g1(rng, 1)[0]]
        p2 = rand_g1(rng, n) + [rand_g1(rng, 1)[0], ocurve.G1_ZERO]
        got = g1_device_to_oracle(
            ops, jmethod('g1', 'add_bj')(g1_batch_to_device(ops, p1), g1_batch_to_device(ops, p2))
        )
        want = [ocurve.g1_add(a, b) for a, b in zip(p1, p2)]
        assert_proj_equal(got, want)
        got = g1_device_to_oracle(
            ops, jmethod('g1', 'double_bl')(g1_batch_to_device(ops, p1))
        )
        want = [ocurve.g1_double(p) for p in p1]
        for i, (g, w) in enumerate(zip(got, want)):
            if w.is_zero():
                assert g.is_zero(), f"elem {i}"
            else:
                assert (g.x, g.y, g.z) == (w.x, w.y, w.z), f"elem {i}"

    def test_neg_and_zero(self, rng):
        ops = dcurve.G1Ops()
        pts = rand_g1(rng, 4) + [ocurve.G1_ZERO]
        got = g1_device_to_oracle(ops, jmethod('g1', 'neg')(g1_batch_to_device(ops, pts)))
        want = [ocurve.g1_neg(p) for p in pts]
        assert_proj_equal(got, want)
        z = ops.zero((3,))
        assert np.asarray(ops.is_zero(z)).all()


class TestEdwards:
    def test_add_complete(self, rng):
        ops = dcurve.EdwardsOps()
        n = 8
        p1 = rand_ed(rng, n)
        p2 = rand_ed(rng, n)
        # complete formulas: identity, equal and inverse lanes run the same code
        p1 += [ocurve.ED_ZERO, p1[0], p1[1], p1[2]]
        p2 += [p2[0], ocurve.ED_ZERO, ocurve.ed_neg(p1[1]), p1[2]]
        got = ed_device_to_oracle(
            ops, jmethod('ed', 'add')(ed_batch_to_device(ops, p1), ed_batch_to_device(ops, p2))
        )
        want = [ocurve.ed_add(a, b) for a, b in zip(p1, p2)]
        for i, (g, w) in enumerate(zip(got, want)):
            assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z), f"elem {i}"

    def test_add_mixed_and_double(self, rng):
        ops = dcurve.EdwardsOps()
        params = ops.ctx.params
        n = 6
        acc = rand_ed(rng, n) + [ocurve.ED_ZERO]
        addend = [
            ocurve.ed_from_affine(*ocurve.ed_to_affine(p))
            for p in rand_ed(rng, n + 1)
        ]
        to_m = lambda v: (v * params.r) % params.p
        aff_dev = (
            batch_to_device([to_m(p.x) for p in addend], params),
            batch_to_device([to_m(p.y) for p in addend], params),
            batch_to_device([to_m(p.t) for p in addend], params),
        )
        got = ed_device_to_oracle(
            ops, jmethod('ed', 'add_mixed')(ed_batch_to_device(ops, acc), aff_dev)
        )
        want = [ocurve.ed_add(a, b) for a, b in zip(acc, addend)]
        for i, (g, w) in enumerate(zip(got, want)):
            assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z), f"elem {i}"

        pts = rand_ed(rng, 4) + [ocurve.ED_ZERO]
        got = ed_device_to_oracle(ops, jmethod('ed', 'double')(ed_batch_to_device(ops, pts)))
        want = [ocurve.ed_double(p) for p in pts]
        for i, (g, w) in enumerate(zip(got, want)):
            assert (g.x, g.y, g.t, g.z) == (w.x, w.y, w.t, w.z), f"elem {i}"
