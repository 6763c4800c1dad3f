"""Limb encode/decode and scalar window decomposition (oracle layer).

Mirrors src/submission/implementation/cuzk/utils.ts:
- to_words_le / from_words_le (utils.ts:371-433)
- decompose_scalars / decompose_scalars_signed (utils.ts:48-109)
- byte-buffer conversions used at the reference's API boundary
  (utils.ts:180-306, src/reference/webgpu/utils.ts:69-78)
"""

from __future__ import annotations

from typing import Sequence


def to_words_le(val: int, num_words: int, word_size: int) -> list[int]:
    """Little-endian fixed-width limb decomposition (utils.ts:371-400)."""
    mask = (1 << word_size) - 1
    return [(val >> (i * word_size)) & mask for i in range(num_words)]


def from_words_le(words: Sequence[int], num_words: int, word_size: int) -> int:
    """Inverse of to_words_le with range assertions (utils.ts:402-418)."""
    assert len(words) == num_words
    val = 0
    for i, w in enumerate(words):
        assert 0 <= w < (1 << word_size), f"limb {i} out of range: {w}"
        val |= int(w) << (i * word_size)
    return val


def from_words_le_unchecked(words: Sequence[int], word_size: int) -> int:
    """from_words_le without assertions (utils.ts:420-433)."""
    val = 0
    for i, w in enumerate(words):
        val |= int(w) << (i * word_size)
    return val


def decompose_scalars(
    scalars: Sequence[int], num_words: int, word_size: int
) -> list[list[int]]:
    """Unsigned window decomposition, transposed to window-major layout.

    Returns result[window][scalar_idx]. Mirrors utils.ts:48-64.
    """
    as_limbs = [to_words_le(s, num_words, word_size) for s in scalars]
    return [[limbs[i] for limbs in as_limbs] for i in range(num_words)]


def decompose_scalars_signed(
    scalars: Sequence[int], num_words: int, word_size: int
) -> list[list[int]]:
    """Signed window decomposition, window-major, stored shifted by +2^(w-1).

    Each window digit d is in [-2^(w-1), 2^(w-1)) and is stored as
    d + 2^(w-1) in [0, 2^w). A carry propagates upward; the final carry must
    be zero (guaranteed because the top window of the scalar field modulus is
    small). Mirrors utils.ts:66-109 exactly, including the error on a final
    carry.
    """
    l = 1 << word_size
    shift = l >> 1
    out: list[list[int]] = []
    for scalar in scalars:
        limbs = to_words_le(scalar, num_words, word_size)
        signed = [0] * num_words
        carry = 0
        for i in range(num_words):
            signed[i] = limbs[i] + carry
            if signed[i] >= shift:
                signed[i] = -(l - signed[i])
                if signed[i] == 0:
                    signed[i] = 0
                carry = 1
            else:
                carry = 0
        if carry == 1:
            raise ValueError(f"final carry is 1 for scalar {scalar}")
        out.append([x + shift for x in signed])
    return [[limbs[i] for limbs in out] for i in range(num_words)]


# ---------------------------------------------------------------------------
# Byte-buffer <-> bigint conversions (the reference's external input format)
# ---------------------------------------------------------------------------


def bigints_to_buffer_le(vals: Sequence[int], byte_len: int) -> bytes:
    """Little-endian packing, byte_len bytes per value.

    Mirrors bigIntsToBufferLE (src/reference/webgpu/utils.ts:69-73). The
    reference harness uses byte_len=48 per BLS12-377 coordinate and 32 per
    scalar.
    """
    out = bytearray(byte_len * len(vals))
    for i, v in enumerate(vals):
        out[i * byte_len : (i + 1) * byte_len] = int(v).to_bytes(
            byte_len, "little"
        )
    return bytes(out)


def buffer_le_to_bigints(buf: bytes, byte_len: int) -> list[int]:
    """Mirrors readBigIntsFromBufferLE (src/reference/webgpu/utils.ts:74-78)."""
    assert len(buf) % byte_len == 0
    return [
        int.from_bytes(buf[i : i + byte_len], "little")
        for i in range(0, len(buf), byte_len)
    ]
