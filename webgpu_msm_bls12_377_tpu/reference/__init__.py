"""Pure-Python bit-exact oracles for every device kernel.

This subpackage plays the role of the reference repo's CPU verification
models (src/submission/implementation/cuzk/{transpose,smvp,bpr}.ts, the
@celo/bls12377js + @noble/curves curve oracles, and the JS Montgomery
algorithm models in src/submission/miscellaneous/tests/mont_mul.test.ts).

Everything here is plain-Python bigint / list arithmetic with explicit u32
machine emulation where relevant, used by the test-suite to differentially
verify the JAX/Pallas kernels.
"""

from . import curve, field, limbs, mont, msm  # noqa: F401
