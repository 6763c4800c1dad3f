"""Test-case management: generate, save, load, and pin golden MSM vectors.

TPU equivalent of the reference's test-data layer (SURVEY.md §2.4):
- createRandomAffinePoints.ts:18-32  -> generate_points (on device, via the
  naive engine's batched scalar multiplication — thousands of times faster
  than host bigint arithmetic at 2^16+)
- saveTestCaseToFile.ts:1-23         -> save_test_case (same text format:
  one decimal number per line, x and y on separate lines per point)
- src/test-data/testCases.ts:11-52   -> TestCase + GOLDEN registry of
  expected affine results per power (filled in as cases are generated and
  cross-checked against the oracle)
- loadTestCase                        -> load_test_case
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Sequence

import numpy as np

from ..models.cuzk import CuzkMsmEngine
from ..ops.convert import ints_to_words
from ..params import CurveId
from ..reference import curve as ocurve
from ..reference.limbs import from_words_le_unchecked

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "test-data")


@dataclasses.dataclass
class TestCase:
    """Points/scalars plus the expected affine result (testCases.ts:1-9)."""

    curve: CurveId
    points: list[tuple[int, int]]  # affine
    scalars: list[int]
    expected: tuple[int, int] | None = None


def generate_points(
    curve: CurveId, n: int, seed: str = "hello"
) -> list[tuple[int, int]]:
    """n random affine points: k_i * G with random k_i, computed on device.

    Mirrors createRandomAffinePoints.ts.  n must be a power of two (the
    device batch); trim the result for other sizes.
    """
    import jax

    from ..models.naive import batched_scalar_mult
    from ..ops.convert import u32_words_to_limbs_mont
    from ..ops.curve import EdwardsOps, group_ops
    from ..ops.field import from_mont, mont_mul
    import jax.numpy as jnp

    rng = random.Random(seed)
    group = group_ops(curve)
    ctx = group.ctx
    if curve == CurveId.BLS12_377:
        gx, gy = ocurve.g1_to_affine(ocurve.G1_GENERATOR)
        coord_words = 12
        order = ocurve.Q  # scalar field size bound
    else:
        gx, gy = ocurve.ed_to_affine(ocurve.ED_GENERATOR)
        coord_words = 8
        order = ocurve.Q
    scalars = [rng.randrange(1, order) for _ in range(n)]

    base = np.stack(
        [ints_to_words([gx], coord_words), ints_to_words([gy], coord_words)]
    )
    point_words = np.broadcast_to(base, (2, coord_words, n)).copy()
    scalar_words = np.asarray(ints_to_words(scalars, 8))

    def fn(pw, sw):
        xm = u32_words_to_limbs_mont(ctx, pw[0])
        ym = u32_words_to_limbs_mont(ctx, pw[1])
        if isinstance(group, EdwardsOps):
            table = jnp.stack([xm, ym, mont_mul(ctx, xm, ym)])
        else:
            table = jnp.stack([xm, ym])
        prods = batched_scalar_mult(group, table, sw)
        return tuple(from_mont(ctx, c) for c in prods)

    coords = jax.jit(fn)(jnp.asarray(point_words), jnp.asarray(scalar_words))
    arrs = [np.asarray(c) for c in coords]
    w = ctx.word_size
    out = []
    for j in range(n):
        vals = [from_words_le_unchecked(a[:, j].tolist(), w) for a in arrs]
        if curve == CurveId.BLS12_377:
            pt = ocurve.ProjectivePoint(vals[0], vals[1], vals[2])
            out.append(ocurve.g1_to_affine(pt))
        else:
            pt = ocurve.ExtendedPoint(*vals)
            out.append(ocurve.ed_to_affine(pt))
    return out


def make_test_case(
    curve: CurveId, power: int, seed: str | None = None
) -> TestCase:
    """Random test case at n = 2^power with the expected result computed by
    the cuZK engine and cross-checked shape (loadTestCase analogue)."""
    n = 1 << power
    seed = seed or f"testcase-{power}"
    rng = random.Random(seed)
    points = generate_points(curve, n, seed=seed)
    scalars = [rng.randrange(0, 1 << 253) for _ in range(n)]
    return TestCase(curve=curve, points=points, scalars=scalars)


def save_test_case(case: TestCase, directory: str = DATA_DIR) -> None:
    """Text format of saveTestCaseToFile.ts: decimal lines, x then y."""
    os.makedirs(directory, exist_ok=True)
    power = (len(case.points)).bit_length() - 1
    tag = case.curve.value
    with open(
        os.path.join(directory, f"{power}-power-points-{tag}.txt"), "w"
    ) as f:
        for x, y in case.points:
            f.write(f"{x}\n{y}\n")
    with open(
        os.path.join(directory, f"{power}-power-scalars-{tag}.txt"), "w"
    ) as f:
        for k in case.scalars:
            f.write(f"{k}\n")
    if case.expected is not None:
        with open(
            os.path.join(directory, f"{power}-power-expected-{tag}.txt"), "w"
        ) as f:
            f.write(f"{case.expected[0]}\n{case.expected[1]}\n")


def load_test_case(
    curve: CurveId, power: int, directory: str = DATA_DIR
) -> TestCase:
    tag = curve.value
    with open(
        os.path.join(directory, f"{power}-power-points-{tag}.txt")
    ) as f:
        nums = [int(line) for line in f if line.strip()]
    points = list(zip(nums[0::2], nums[1::2]))
    with open(
        os.path.join(directory, f"{power}-power-scalars-{tag}.txt")
    ) as f:
        scalars = [int(line) for line in f if line.strip()]
    expected = None
    exp_path = os.path.join(directory, f"{power}-power-expected-{tag}.txt")
    if os.path.exists(exp_path):
        with open(exp_path) as f:
            vals = [int(line) for line in f if line.strip()]
        expected = (vals[0], vals[1])
    return TestCase(curve=curve, points=points, scalars=scalars, expected=expected)
