"""ctypes bindings for the native C++ MSM oracle.

Build-on-first-use: generates params_generated.h from params.py, compiles
msm_oracle.cpp with g++ into a shared library next to this file, and loads
it with ctypes (no pybind11 in this environment).  The native oracle is
the fast ground-truth verifier for large MSMs — the role the Rust snarkVM
WASM module plays in the reference harness (src/reference/reference.ts).

Usage:
    from webgpu_msm_bls12_377_tpu import native
    x, y = native.msm_g1(points_buf, scalars_buf)   # wire-format buffers
    x, y = native.msm_g1_ints(affine_pairs, scalar_ints)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmsm_oracle.so")
_SRC = os.path.join(_DIR, "msm_oracle.cpp")
_lib = None


def available() -> bool:
    try:
        return _load() is not None
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(
        _LIB_PATH
    ) < os.path.getmtime(_SRC):
        from .gen_params import generate

        generate()
        subprocess.run(
            [
                "g++",
                "-O2",
                "-shared",
                "-fPIC",
                "-pthread",
                "-o",
                _LIB_PATH,
                _SRC,
            ],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    for fn in (lib.msm_g1, lib.msm_edwards):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_char_p,
        ]
    _lib = lib
    return lib


def msm_g1(points_buf: bytes, scalars_buf: bytes) -> tuple[int, int]:
    """BLS12-377 G1 MSM over wire-format buffers; returns affine (x, y)."""
    lib = _load()
    n = len(scalars_buf) // 32
    assert len(points_buf) == 96 * n
    out = ctypes.create_string_buffer(96)
    rc = lib.msm_g1(points_buf, scalars_buf, n, out)
    assert rc == 0
    raw = out.raw
    return (
        int.from_bytes(raw[:48], "little"),
        int.from_bytes(raw[48:], "little"),
    )


def msm_edwards(points_buf: bytes, scalars_buf: bytes) -> tuple[int, int]:
    lib = _load()
    n = len(scalars_buf) // 32
    assert len(points_buf) == 64 * n
    out = ctypes.create_string_buffer(64)
    rc = lib.msm_edwards(points_buf, scalars_buf, n, out)
    assert rc == 0
    raw = out.raw
    return (
        int.from_bytes(raw[:32], "little"),
        int.from_bytes(raw[32:], "little"),
    )


def _pack(vals, nbytes):
    return b"".join(int(v).to_bytes(nbytes, "little") for v in vals)


def msm_g1_ints(points, scalars) -> tuple[int, int]:
    pts = b"".join(_pack((x, y), 48) for x, y in points)
    return msm_g1(pts, _pack(scalars, 32))


def msm_edwards_ints(points, scalars) -> tuple[int, int]:
    pts = b"".join(_pack((x, y), 32) for x, y in points)
    return msm_edwards(pts, _pack(scalars, 32))
