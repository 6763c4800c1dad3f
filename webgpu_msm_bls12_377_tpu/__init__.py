"""TPU-native multi-scalar multiplication (MSM) framework for BLS12-377 G1
and Twisted Edwards BLS12 ("Edwards BLS12" / Aleo) curves.

A from-scratch rebuild of the capabilities of the ZPrize 2023 "Beat the Best"
WebGPU submission (reference: src/submission/submission.ts) as an idiomatic
JAX/XLA/Pallas library:

- 377-bit / 253-bit field arithmetic in 13-bit limb planes over uint32 VPU
  lanes (carry-free Montgomery product, nsafe analysis identical to the
  reference's README.md:386-396).
- cuZK-shaped MSM pipeline: signed-window scalar decomposition, scatter-free
  bucket accumulation (sort + hierarchical segmented block scan replaces the
  reference's CSR transpose + SMVP; see ops/bucket.py), parallel running-sum
  bucket reduction, Horner aggregation.
- Multi-chip scaling via jax.sharding.Mesh + shard_map: points sharded over
  the mesh, per-window partial results combined with all_gather over ICI.

Public API mirrors the reference's single entry point
`compute_msm(points, scalars) -> {x, y}` (src/submission/submission.ts:85-94).
"""

from .params import (
    BLS12_377_BASE_FIELD,
    EDWARDS_BLS12_BASE_FIELD,
    CurveId,
    MontParams,
    compute_misc_params,
)
from .api import compute_msm, compute_msm_edwards

__version__ = "0.1.0"

__all__ = [
    "BLS12_377_BASE_FIELD",
    "EDWARDS_BLS12_BASE_FIELD",
    "CurveId",
    "MontParams",
    "compute_misc_params",
    "compute_msm",
    "compute_msm_edwards",
]
