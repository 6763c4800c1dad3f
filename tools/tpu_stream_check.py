"""Quick real-TPU correctness check of the streamed SMVP path.

Runs the engine at a small power with distinct points (known-k identity)
for each smvp mode given on the command line, printing timing + verdict.

Run: python tools/tpu_stream_check.py [power] [modes...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from webgpu_msm_bls12_377_tpu.harness import testdata
from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine, choose_chunk_size
from webgpu_msm_bls12_377_tpu.params import CurveId


def main():
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    modes = sys.argv[2:] or ["stream"]
    n = 1 << power
    case = testdata.make_bench_case(
        CurveId.BLS12_377, power, cross_check=False
    )
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}  n=2^{power}")
    pw = jnp.asarray(case.point_words)
    sw = jnp.asarray(case.scalar_words)
    np.asarray(pw[0, 0, :1]); np.asarray(sw[0, :1])  # stage + fence

    for mode in modes:
        eng = CuzkMsmEngine(CurveId.BLS12_377, smvp_mode=mode)
        cs = choose_chunk_size(n)
        t0 = time.perf_counter()
        coords = eng.msm_device(pw, sw, cs)
        res = eng._finalize(coords, cs)
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            coords = eng.msm_device(pw, sw, cs)
            res = eng._finalize(coords, cs)
            warm.append(time.perf_counter() - t0)
        ok = (res["x"], res["y"]) == case.expected
        print(
            f"mode={mode:8s} cold={cold:.2f}s warm={min(warm):.4f}s "
            f"({n/min(warm)/1e3:.1f}k pts/s) verified={ok}",
            flush=True,
        )
        if not ok:
            raise SystemExit(f"MISMATCH in mode {mode}")


if __name__ == "__main__":
    main()
