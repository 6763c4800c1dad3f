"""Public MSM entry points.

Mirrors the reference's single async entry point
`compute_msm(baseAffinePoints, scalars) -> {x, y}`
(src/submission/submission.ts:85-94): points and scalars may be given as
python ints, numpy arrays of limbs, or raw little-endian byte buffers in the
reference's wire format (48 bytes per coordinate, 32 bytes per scalar).
"""

from __future__ import annotations

from typing import Any, Sequence


def compute_msm(
    points: Any,
    scalars: Any,
    *,
    log_result: bool = False,
    force_recompile: bool = False,
) -> dict[str, int]:
    """BLS12-377 G1 MSM. Returns the affine result as {"x": int, "y": int}.

    Accepts:
    - points: sequence of (x, y) int pairs, or a bytes buffer of
      x||y little-endian 48-byte coordinates (96 bytes per point)
    - scalars: sequence of ints, or a bytes buffer of 32-byte LE scalars
    """
    from .models.cuzk import CuzkMsmEngine
    from .params import CurveId

    engine = CuzkMsmEngine(CurveId.BLS12_377, force_recompile=force_recompile)
    result = engine.compute_msm(points, scalars)
    if log_result:
        print(result)
    return result


def compute_msm_edwards(
    points: Any,
    scalars: Any,
    *,
    log_result: bool = False,
    force_recompile: bool = False,
) -> dict[str, int]:
    """Twisted Edwards BLS12 MSM. Same interface as compute_msm."""
    from .models.cuzk import CuzkMsmEngine
    from .params import CurveId

    engine = CuzkMsmEngine(CurveId.EDWARDS_BLS12, force_recompile=force_recompile)
    result = engine.compute_msm(points, scalars)
    if log_result:
        print(result)
    return result
