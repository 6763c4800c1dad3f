"""Multi-host dryrun as a pytest tier (round-3 verdict item #2).

Wraps tools/dryrun_multihost.py — 2 processes x 4 virtual CPU devices
running one sharded MSM through jax.distributed, each process checking
the replicated result against the bigint oracle.  The reference has no
multi-process story (SURVEY.md §2.7: "none"); this validates the
process-spanning collectives (per-window pmax + partial-sum all_gather)
that a real multi-host TPU slice would use over DCN.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "tools", "dryrun_multihost.py")


@pytest.mark.slow  # ~2 min: two fresh processes full of XLA CPU compiles
def test_multihost_dryrun_matches_oracle():
    env = dict(os.environ)
    # workers pin their own platform/device count
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"multihost dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "OK" in proc.stdout
