"""Multi-host dryrun: 2 processes x 4 virtual CPU devices, one MSM.

Proves the process-spanning path end-to-end without pod hardware: both
processes initialize jax.distributed against a local coordinator, build
the global 8-device mesh, run the sharded cuZK pipeline (whose
collectives — the per-window pmax and the partial-sum all_gather — now
span processes), and every process checks the replicated result against
the bigint oracle.

Run:  python tools/dryrun_multihost.py            # spawns the workers
      python tools/dryrun_multihost.py --worker I # internal
"""

import os
import subprocess
import sys

NUM_PROCESSES = 2
LOCAL_DEVICES = 4
PORT = 48923


def worker(process_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from webgpu_msm_bls12_377_tpu.parallel import multihost

    multihost.init(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
        local_device_count=LOCAL_DEVICES,
        platform="cpu",
    )
    import jax

    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert jax.device_count() == NUM_PROCESSES * LOCAL_DEVICES

    from webgpu_msm_bls12_377_tpu.params import CurveId
    from webgpu_msm_bls12_377_tpu.reference import curve as crv
    from webgpu_msm_bls12_377_tpu.reference.msm import G1, naive_msm

    engine = multihost.make_engine(CurveId.BLS12_377, chunk_size=4)
    n = 64
    pts = [crv.g1_scalar_mult(crv.G1_GENERATOR, 3 * k + 1) for k in range(n)]
    aff = [crv.g1_to_affine(p) for p in pts]
    scalars = [(7 * k + 5) % (1 << 60) for k in range(n)]
    got = engine.compute_msm(aff, scalars)
    want = crv.g1_to_affine(naive_msm(pts, scalars, G1))
    assert (got["x"], got["y"]) == want, "multihost MSM mismatch"
    print(f"process {process_id}: result matches oracle", flush=True)

    # pipelined sharded BATCH across processes (BASELINE config 5): both
    # processes execute the same enqueue order — per-set sharded plans,
    # one pmax-replicated batched readback, per-set mains — and check
    # every set's replicated result.  stream-interpret so the PIPELINED
    # path (not the serial legacy fallback) is the one crossing
    # processes.
    engine_b = multihost.make_engine(
        CurveId.BLS12_377, chunk_size=4, num_bpr_threads=8,
        smvp_mode="stream-interpret", stream_lanes=8,
    )
    batches = [
        [(11 * k + 3 * s + 1) % (1 << 60) for k in range(n)]
        for s in range(2)
    ]
    res = engine_b.compute_msm_batch(aff, batches)
    for r, ks in zip(res, batches):
        want = crv.g1_to_affine(naive_msm(pts, ks, G1))
        assert (r["x"], r["y"]) == want, "multihost batch MSM mismatch"
    print(f"process {process_id}: pipelined batch matches oracle",
          flush=True)


def main() -> int:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return 0
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    for i in range(NUM_PROCESSES):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
                env=env,
            )
        )
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=1200)
    print("dryrun_multihost:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
