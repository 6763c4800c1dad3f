"""Multi-host execution: the MSM engine on a process-spanning mesh.

The reference scales its CPU ground truth with an in-browser rayon worker
pool (src/workers/wasmMSM.ts:1-13); the TPU-native scaling analogue for
the *device* pipeline is a pod slice spanning multiple hosts: every host
drives its local chips, `jax.distributed` links the processes, and the
mesh in parallel/mesh.py simply spans all global devices — the per-window
partial-sum all_gather then rides ICI within a host's chips and DCN
across hosts, exactly the BASELINE.json north-star topology.

Nothing else changes: ShardedMsmEngine's pipeline is already written
against a Mesh, its plan->main host sync is a replicated num_windows-int
array (readable from every process), and inputs enter through
make_array_from_callback (each process contributes its addressable
shards).  This module only packages process bootstrap + global mesh
construction, and a self-test driver lives in tools/dryrun_multihost.py
(2 processes x 4 virtual CPU devices).

On a real pod slice:

    # one process per host, e.g. under GCE metadata auto-detection:
    from webgpu_msm_bls12_377_tpu.parallel import multihost
    multihost.init()                      # args auto-detected on Cloud TPU
    engine = multihost.make_engine(CurveId.BLS12_377)
    result = engine.compute_msm(points, scalars)   # same single-call API
"""

from __future__ import annotations

import os

from ..params import CurveId


def init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
    platform: str | None = None,
) -> None:
    """Initialize the JAX distributed runtime for this process.

    On Cloud TPU all arguments are auto-detected (jax.distributed reads
    the TPU metadata).  For CPU-based rehearsal (tools/dryrun_multihost)
    pass coordinator/num_processes/process_id explicitly plus
    local_device_count virtual devices and platform="cpu".

    Must run before any other JAX call in the process: both the platform
    pin and --xla_force_host_platform_device_count are ignored once a
    backend is initialized (and this environment's sitecustomize
    force-registers its TPU backend unless the pin comes first).
    """
    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()

    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh():
    """1-D points mesh over every device of every process."""
    from .mesh import make_mesh

    import jax

    return make_mesh(jax.devices())  # global devices, process-spanning


def make_engine(curve: CurveId, **kw):
    """ShardedMsmEngine over the process-spanning global mesh."""
    from .mesh import ShardedMsmEngine

    return ShardedMsmEngine(curve, mesh=global_mesh(), **kw)
