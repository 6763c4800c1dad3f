"""Windowed bucket-method (Pippenger) MSM engine.

The reference ships a standalone Pippenger WebGPU engine beside the
cuZK submission (/root/reference/src/reference/webgpu/msm.ts — signed
decomposition, per-window bucket accumulation, running-sum reduction).
Here the same method is the *legacy* mode of the production engine:
signed digit decomposition (ops/decompose.py), per-window bucket
accumulation in masked lockstep rounds (ops/buckets.py:
accumulate_buckets), running-sum bucket reduction (ops/bpr.py) and a
host Horner walk — i.e. classic Pippenger without the cuZK
sparse-matrix stream scheduling.  This class pins that configuration
under its proper name so the baseline-engine inventory (SURVEY.md §2
component 26) is runnable standalone on both curves.
"""

from __future__ import annotations

from ..params import CurveId
from .cuzk import CuzkMsmEngine


class PippengerMsmEngine(CuzkMsmEngine):
    """CuzkMsmEngine pinned to the classic windowed bucket method.

    Same public API (compute_msm / compute_msm_batch / msm_device);
    only the SMVP scheduling differs — per-window masked lockstep
    rounds instead of the length-sorted slab stream.
    """

    def __init__(self, curve: CurveId = CurveId.BLS12_377, **kwargs):
        kwargs.setdefault("smvp_mode", "legacy")
        if kwargs["smvp_mode"] != "legacy":
            raise ValueError(
                "PippengerMsmEngine is the legacy bucket method; "
                f"smvp_mode={kwargs['smvp_mode']!r} is not it"
            )
        super().__init__(curve, **kwargs)
