"""Fused Pallas kernels vs the jnp group ops, in interpreter mode on CPU.

The kernels reuse the jnp group-op code on VMEM blocks, so interpret-mode
equality plus the TPU-side bit-exactness check (run manually on hardware)
pins both semantics and lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.ops import curve as dcurve
from webgpu_msm_bls12_377_tpu.ops import pallas_kernels as pk
from webgpu_msm_bls12_377_tpu.ops.curve import select

B = pk.BLOCK  # one block per grid step keeps interpret mode fast


def rand_limbs(key, rows=30):
    return jnp.asarray(key.randint(0, 8192, (rows, B)).astype(np.uint32))


@pytest.fixture(scope="module")
def data():
    key = np.random.RandomState(7)
    ops = dcurve.G1Ops()
    acc = dcurve.ProjG1(rand_limbs(key), rand_limbs(key), rand_limbs(key))
    aff = (rand_limbs(key), rand_limbs(key))
    sign = jnp.asarray(key.randint(0, 2, B).astype(bool))
    valid = jnp.asarray(key.randint(0, 2, B).astype(bool))
    return ops, acc, aff, sign, valid


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_masked_add_mixed_interpret(data):
    ops, acc, aff, sign, valid = data
    got = pk.masked_add_mixed(ops, acc, aff, sign, valid, interpret=True)
    neg = ops.neg_affine(aff)
    signed = tuple(
        jnp.where(sign[None, :], pa, na) for pa, na in zip(aff, neg)
    )
    want = select(valid, ops.add_mixed(acc, signed), acc)
    for g, w in zip(got, want):
        assert bool(jnp.array_equal(g, w))


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_fused_add_interpret(data):
    ops, acc, aff, _, _ = data
    other = dcurve.ProjG1(aff[0], aff[1], acc.x)
    got = pk.fused_add(ops, acc, other, interpret=True)
    want = ops.add(acc, other)
    for g, w in zip(got, want):
        assert bool(jnp.array_equal(g, w))


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_masked_add_and_double_interpret(data):
    ops, acc, aff, sign, _ = data
    temp = dcurve.ProjG1(aff[0], aff[1], acc.y)
    got_r, got_t = pk.masked_add_and_double(ops, acc, temp, sign, interpret=True)
    added = ops.add(acc, temp)
    want_r = select(sign, added, acc)
    want_t = ops.double(temp)
    for g, w in list(zip(got_r, want_r)) + list(zip(got_t, want_t)):
        assert bool(jnp.array_equal(g, w))


def test_small_batch_falls_back(data):
    """Batches below one block take the plain jnp path (same values)."""
    ops, acc, aff, sign, valid = data
    small = dcurve.ProjG1(*(c[:, :64] for c in acc))
    aff_s = tuple(c[:, :64] for c in aff)
    got = pk.masked_add_mixed(ops, small, aff_s, sign[:64], valid[:64])
    neg = ops.neg_affine(aff_s)
    signed = tuple(
        jnp.where(sign[:64][None, :], pa, na) for pa, na in zip(aff_s, neg)
    )
    want = select(valid[:64], ops.add_mixed(small, signed), small)
    for g, w in zip(got, want):
        assert bool(jnp.array_equal(g, w))


@pytest.mark.slow  # multi-minute XLA:CPU compile (round-5 suite budget:
# the default suite must finish < 5 min; see README testing section)
def test_fused_running_add_interpret(data):
    """BPR stage-1 step kernel: m' = m + b; g' = g + m' in one call."""
    ops, acc, aff, _, _ = data
    g0 = dcurve.ProjG1(aff[0], aff[1], acc.z)
    b = dcurve.ProjG1(acc.y, aff[0], acc.x)
    got_m, got_g = pk.fused_running_add(ops, acc, g0, b, interpret=True)
    want_m = ops.add(acc, b)
    want_g = ops.add(g0, want_m)
    for g, w in zip(tuple(got_m) + tuple(got_g), tuple(want_m) + tuple(want_g)):
        assert bool(jnp.array_equal(g, w))
