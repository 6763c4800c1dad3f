"""Naive device MSM: per-point double-and-add, then a tree sum.

TPU-native equivalent of the reference's baseline WebGPU engine
`naive_msm` (src/reference/webgpu/entries/naiveMSMEntry.ts:11-260): every
point is multiplied by its scalar with a branch-free double-and-add over
all lanes at once (the reference chains 64-bit multipass shaders for the
same computation), then the products are folded with a log-depth on-device
tree; the reference instead sums on the CPU.

This is a correctness/throughput baseline, not the production engine —
it costs ~256 point ops per point vs the cuZK pipeline's ~16+ — but its
batched scalar multiplication is independently useful: the test-data
harness uses it to generate large random-point fixtures on device
(harness/testdata.py), mirroring createRandomAffinePoints.ts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.convert import u32_words_to_limbs_mont
from ..ops.curve import EdwardsOps, group_ops
from ..ops.decompose import decompose_scalars_signed  # noqa: F401 (API kin)
from ..ops.field import from_mont, mont_mul
from ..ops.pallas_kernels import fused_add, masked_add_and_double
from ..params import CurveId

SCALAR_BITS = 256


def batched_scalar_mult(group, table, scalar_words):
    """k_i * P_i for every lane, branch-free double-and-add (LSB first).

    table: (C_aff, W, N) Montgomery affine coords; scalar_words: (8, N).
    Returns a projective/extended point batch of N lanes.
    """
    n = table.shape[-1]
    acc = group.zero((n,))
    temp = group.from_affine(tuple(table[c] for c in range(table.shape[0])))

    def body(state, t):
        acc, temp = state
        word = jax.lax.dynamic_index_in_dim(
            scalar_words, t // 32, axis=0, keepdims=False
        )
        bit = (word >> (t % 32).astype(jnp.uint32)) & 1
        acc, temp = masked_add_and_double(group, acc, temp, bit == 1)
        return (acc, temp), None

    (acc, _), _ = jax.lax.scan(
        body, (acc, temp), jnp.arange(SCALAR_BITS, dtype=jnp.uint32)
    )
    return acc


def tree_sum(group, points):
    """Fold N lanes into lane 0 with log2(N) batched adds (N power of 2)."""
    width = points[0].shape[-1]
    while width > 1:
        half = width // 2
        lo = type(points)(*(c[:, :half] for c in points))
        hi = type(points)(*(c[:, half : 2 * half] for c in points))
        points = fused_add(group, lo, hi)
        width = half
    return points


class NaiveMsmEngine:
    """Baseline MSM engine with the same public surface as CuzkMsmEngine."""

    def __init__(self, curve: CurveId):
        self.curve = curve
        self.group = group_ops(curve)
        self.ctx = self.group.ctx

    def build_fn(self):
        ctx = self.ctx
        group = self.group
        is_edwards = isinstance(group, EdwardsOps)

        def fn(point_words, scalar_words):
            xm = u32_words_to_limbs_mont(ctx, point_words[0])
            ym = u32_words_to_limbs_mont(ctx, point_words[1])
            if is_edwards:
                table = jnp.stack([xm, ym, mont_mul(ctx, xm, ym)])
            else:
                table = jnp.stack([xm, ym])
            prods = batched_scalar_mult(group, table, scalar_words)
            total = tree_sum(group, prods)
            return tuple(from_mont(ctx, c) for c in total)

        return fn
