"""Stage 1a — point coordinate conversion (wire words -> Montgomery limbs).

TPU-native equivalent of the reference's convert_point_coords half of the
stage-1 shader (src/submission/implementation/wgsl/cuzk/
convert_point_coords_and_decompose_scalars.template.wgsl:39-117): repack
little-endian 32-bit wire words into 13-bit limb vectors and enter the
Montgomery domain.

The reference converts via a Barrett field_mul(x, r); here Montgomery entry
is a single mont_mul with r^2 (identical canonical result, cheaper kernel —
see ops/field.py:to_mont).  The bit-slicing is a static unroll over limbs:
every limb touches at most two 32-bit words, so the whole repack is ~2
shift-mask vector ops per limb on the VPU with no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .field import FieldCtx, U32, mont_mul, to_mont


def limbs_from_u32_words(
    words: jnp.ndarray, num_words: int, word_size: int
) -> jnp.ndarray:
    """(num_u32, N) LE 32-bit words -> (num_words, N) w-bit limbs.

    Mirrors the extract_word_from_bytes_le bit-slicing
    (src/submission/implementation/wgsl/cuzk/extract_word_from_bytes_le
    .template.wgsl:1-52), generalized to any limb width <= 16.
    """
    mask = jnp.uint32((1 << word_size) - 1)
    num_u32 = words.shape[0]
    rows = []
    for i in range(num_words):
        bit = i * word_size
        a, off = divmod(bit, 32)
        v = words[a] >> off
        if off + word_size > 32 and a + 1 < num_u32:
            v = v | (words[a + 1] << (32 - off))
        rows.append(v & mask)
    return jnp.stack(rows)


def u32_words_to_limbs_mont(
    ctx: FieldCtx, words: jnp.ndarray
) -> jnp.ndarray:
    """Wire words -> Montgomery-form limb batch (the stage-1a kernel).

    The Montgomery entry (x * r^2 under REDC) runs as a fused Pallas
    kernel on TPU for table-sized batches.
    """
    from .pallas_kernels import mont_mul_const

    limbs = limbs_from_u32_words(words, ctx.num_words, ctx.word_size)
    return mont_mul_const(ctx, limbs, ctx.r2_col)


def edwards_extended_table(
    ctx: FieldCtx, x_words: jnp.ndarray, y_words: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Affine Edwards wire coords -> Montgomery (x, y, t=x*y) addend table.

    The extended T coordinate is synthesized on-device, the analogue of the
    reference's SMVP shader synthesizing T/Z to stay within its storage
    buffer budget (smvp_bls12_377.template.wgsl:70-160 and README.md:505).
    """
    xm = u32_words_to_limbs_mont(ctx, x_words)
    ym = u32_words_to_limbs_mont(ctx, y_words)
    tm = mont_mul(ctx, xm, ym)
    return xm, ym, tm


# ---------------------------------------------------------------------------
# Host-side wire packing (numpy; the reference's Buffer input format)
# ---------------------------------------------------------------------------


def points_buffer_to_words(buf: bytes, coord_bytes: int) -> np.ndarray:
    """x||y LE byte buffer -> (2, coord_bytes//4, N) uint32 word array.

    Mirrors the reference's input format: 48 bytes per BLS12-377 coordinate
    (README.md:88-104), 32 per Edwards coordinate; two coords per point.
    """
    per_point = 2 * coord_bytes
    assert len(buf) % per_point == 0
    n = len(buf) // per_point
    words = np.frombuffer(buf, dtype="<u4").reshape(n, per_point // 4)
    c = coord_bytes // 4
    return np.stack([words[:, :c].T, words[:, c:].T])


def scalars_buffer_to_words(buf: bytes) -> np.ndarray:
    """32-byte LE scalars -> (8, N) uint32 word array (README.md:327-339)."""
    assert len(buf) % 32 == 0
    n = len(buf) // 32
    return np.frombuffer(buf, dtype="<u4").reshape(n, 8).T


def ints_to_words(vals, num_u32: int) -> np.ndarray:
    """Python ints -> (num_u32, N) LE uint32 word array."""
    out = np.zeros((num_u32, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        v = int(v)
        for i in range(num_u32):
            out[i, j] = (v >> (32 * i)) & 0xFFFFFFFF
    return out
