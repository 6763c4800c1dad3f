"""Device compute layer: field/curve kernels and the cuZK pipeline stages.

Modules (each maps to a reference WGSL stage — see COMPONENTS.md):
- field:  limb-vectorized Montgomery/Barrett field arithmetic
- curve:  batched complete point formulas (G1 RCB, Edwards hwcd)
- convert/decompose: stage 1 (wire repack + signed windows)
- buckets: stages 2+3 (sort-transpose + lockstep bucket accumulation)
- bpr:    stage 4 (parallel running-sum reduction)
- pallas_kernels: fused TPU kernels for the hot point ops
"""
