"""Device Montgomery product across limb widths (the reference's w-study).

The reference benchmarked Montgomery shader families at word sizes 12-16
and picked per-device winners (README.md:386-430).  These tests pin the
TPU-native counterparts' correctness: the carry-free path (w <= 13) and
the per-step-fold path (w in {14, 15}, the lockstep analogue of
mont_pro_modified) both against exact bigint arithmetic; w=16 must be
rejected (a single u32 product pair overflows, as the reference found).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from webgpu_msm_bls12_377_tpu.ops import field as dfield
from webgpu_msm_bls12_377_tpu.params import CurveId, mont_params_for
from webgpu_msm_bls12_377_tpu.reference.limbs import (
    from_words_le_unchecked,
    to_words_le,
)

P = mont_params_for(CurveId.BLS12_377).p
LANES = 4


def _cols(vals, n, w):
    return jnp.asarray(
        np.stack([to_words_le(v, n, w) for v in vals], axis=1).astype(
            np.uint32
        )
    )


@pytest.mark.parametrize("word_size", [12, 13, 14, 15])
def test_mont_mul_widths_match_bigint(word_size):
    ctx = dfield.field_ctx(CurveId.BLS12_377, word_size=word_size)
    params = ctx.params
    rng = random.Random(f"w{word_size}")
    xs = [rng.randrange(0, P) for _ in range(LANES)]
    ys = [rng.randrange(0, P) for _ in range(LANES)]
    # include worst-case operands for the overflow analysis
    xs[0] = P - 1
    ys[0] = P - 1
    xc = _cols(xs, params.num_words, word_size)
    yc = _cols(ys, params.num_words, word_size)
    out = jax.jit(lambda a, b: dfield.mont_mul(ctx, a, b))(xc, yc)
    arr = np.asarray(out)
    for j in range(LANES):
        got = from_words_le_unchecked(arr[:, j].tolist(), word_size)
        want = (xs[j] * ys[j] * params.rinv) % P
        assert got == want, (word_size, j)


def test_word_size_16_rejected():
    ctx = dfield.field_ctx(CurveId.BLS12_377, word_size=16)
    x = jnp.zeros((ctx.num_words, 1), jnp.uint32)
    with pytest.raises(AssertionError, match="overflows u32"):
        dfield.mont_mul(ctx, x, x)
