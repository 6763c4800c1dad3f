"""Native C++ oracle vs the Python bigint oracle (both curves).

The native library (64-bit CIOS Montgomery + unsigned Pippenger) shares no
code or limb layout with either the Python oracle or the device pipeline;
three-way agreement pins correctness (the role of the reference's Rust
WASM ground truth, src/reference/reference.ts:7-62).
"""

import random

import pytest

from webgpu_msm_bls12_377_tpu import native
from webgpu_msm_bls12_377_tpu.reference import curve as crv
from webgpu_msm_bls12_377_tpu.reference.msm import EDWARDS, G1, naive_msm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ not available"
)


def test_msm_g1_matches_python_oracle(rng):
    n = 12
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]
    aff = [crv.g1_to_affine(p) for p in pts]
    ks = [rng.randrange(0, 1 << 253) for _ in range(n)]
    ks[0] = 0
    ks[1] = 1
    got = native.msm_g1_ints(aff, ks)
    want = crv.g1_to_affine(naive_msm(pts, ks, G1))
    assert got == want


def test_msm_edwards_matches_python_oracle(rng):
    n = 12
    pts = [
        crv.ed_scalar_mult(crv.ED_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]
    aff = [crv.ed_to_affine(p) for p in pts]
    ks = [rng.randrange(0, 1 << 253) for _ in range(n)]
    got = native.msm_edwards_ints(aff, ks)
    want = crv.ed_to_affine(naive_msm(pts, ks, EDWARDS))
    assert got == want


def test_wire_format_buffers(rng):
    from webgpu_msm_bls12_377_tpu.reference.limbs import bigints_to_buffer_le

    n = 8
    pts = [
        crv.g1_scalar_mult(crv.G1_GENERATOR, rng.randrange(1, 1 << 64))
        for _ in range(n)
    ]
    aff = [crv.g1_to_affine(p) for p in pts]
    ks = [rng.randrange(0, 1 << 253) for _ in range(n)]
    coords = []
    for x, y in aff:
        coords.extend([x, y])
    got = native.msm_g1(
        bigints_to_buffer_le(coords, 48), bigints_to_buffer_le(ks, 32)
    )
    want = crv.g1_to_affine(naive_msm(pts, ks, G1))
    assert got == want
