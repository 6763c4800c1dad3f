"""Stage 1b — signed scalar window decomposition on device.

TPU-native equivalent of the decompose_scalars half of the reference's
stage-1 shader (convert_point_coords_and_decompose_scalars.template.wgsl:
119-144) and its CPU model decompose_scalars_signed
(src/submission/implementation/cuzk/utils.ts:66-109):

each 256-bit scalar (8 LE u32 words) is split into windows of chunk_size
bits; each window digit d is recentred to [-2^(s-1), 2^(s-1)) with a carry
into the next window, and stored shifted by +2^(s-1).  The carry loop is
sequential over the (few) windows but fully vectorized over the scalar
batch — the exact transpose of the reference's per-thread loop.

The final carry is provably zero for canonical scalars (< the 253-bit
scalar field): the top window of the modulus is 0x12ab < 2^(s-1)
(README.md:447-453), so no overflow lane can exist.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import U32


def decompose_scalars_signed(
    scalar_words: jnp.ndarray, chunk_size: int, num_windows: int
) -> jnp.ndarray:
    """(8, N) LE u32 scalar words -> (num_windows, N) stored signed digits.

    Stored digit = signed digit + 2^(chunk_size-1), in [0, 2^chunk_size).
    Window-major layout, matching the reference's scalar_chunks buffer.
    """
    num_u32 = scalar_words.shape[0]
    mask = jnp.uint32((1 << chunk_size) - 1)

    chunks = []
    for k in range(num_windows):
        bit = k * chunk_size
        a, off = divmod(bit, 32)
        v = scalar_words[a] >> off
        if off + chunk_size > 32 and a + 1 < num_u32:
            v = v | (scalar_words[a + 1] << (32 - off))
        chunks.append(v & mask)

    l = jnp.uint32(1 << chunk_size)
    shift = jnp.uint32(1 << (chunk_size - 1))
    carry = jnp.zeros_like(chunks[0])
    rows = []
    for k in range(num_windows):
        v = chunks[k] + carry
        ge = v >= shift
        # stored = (v - l) + shift on carry lanes, v + shift otherwise
        rows.append(jnp.where(ge, v - shift, v + shift))
        carry = ge.astype(U32)
    return jnp.stack(rows)
