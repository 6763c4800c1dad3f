"""Auto-tuning table: selection, persistence, and engine integration
(harness/autotune.py) — the reference's per-device benchmarking story
(README.md:386-430) as a live harness.  Measurements are injected so
the test exercises the logic, not the clock."""

import json

from webgpu_msm_bls12_377_tpu.harness import autotune
from webgpu_msm_bls12_377_tpu.models.cuzk import CuzkMsmEngine
from webgpu_msm_bls12_377_tpu.params import CurveId


def test_autotune_selects_persists_and_engine_consults(
    tmp_path, monkeypatch
):
    monkeypatch.setenv("MSM_AUTOTUNE_DIR", str(tmp_path))

    fake = {13: 0.30, 15: 0.20, 16: 0.25}

    def measure(engine_cls, curve, n, chunk, runs):
        assert engine_cls is CuzkMsmEngine and runs == 2
        return fake[chunk]

    w = autotune.autotune_chunk(
        CurveId.BLS12_377, 1 << 16, measure_fn=measure
    )
    assert w == 15

    # persisted, keyed by device/curve/n, with the timings recorded
    with open(tmp_path / ".autotune.json") as f:
        table = json.load(f)
    (dev_entry,) = table.values()
    entry = dev_entry["BLS12_377"]["65536"]
    assert entry["chunk"] == 15
    assert entry["warm_s"]["13"] == 0.30

    # lookup: tuned size hits, untuned size misses
    assert autotune.lookup(CurveId.BLS12_377, 1 << 16) == 15
    assert autotune.lookup(CurveId.BLS12_377, 1 << 18) is None
    assert autotune.lookup(CurveId.EDWARDS_BLS12, 1 << 16) is None

    # engine consults the table only when autotune=True, and the
    # explicit override still wins
    eng = CuzkMsmEngine(CurveId.BLS12_377, autotune=True)
    assert eng._chunk_for(1 << 16) == 15
    assert eng._chunk_for(1 << 18) == 15  # static policy fallback
    assert eng._chunk_for(1 << 20) == 16
    off = CuzkMsmEngine(CurveId.BLS12_377)
    assert off._chunk_for(1 << 16) == 15  # static policy (coincides)
    fake2 = {**fake, 13: 0.01}

    def measure2(engine_cls, curve, n, chunk, runs):
        return fake2[chunk]

    assert (
        autotune.autotune_chunk(
            CurveId.BLS12_377, 1 << 16, measure_fn=measure2
        )
        == 13
    )
    assert CuzkMsmEngine(
        CurveId.BLS12_377, autotune=True
    )._chunk_for(1 << 16) == 13
    ov = CuzkMsmEngine(CurveId.BLS12_377, autotune=True, chunk_size=16)
    assert ov._chunk_for(1 << 16) == 16
