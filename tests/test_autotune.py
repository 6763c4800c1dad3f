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


def test_autotune_default_on_and_disable(tmp_path, monkeypatch):
    """autotune is the DEFAULT policy: an engine with no flags consults
    the table; autotune=False restores the static policy."""
    monkeypatch.setenv("MSM_AUTOTUNE_DIR", str(tmp_path))
    autotune.autotune_chunk(
        CurveId.BLS12_377, 1 << 18,
        measure_fn=lambda *_a: {13: 0.1, 15: 0.3, 16: 0.3}[_a[3]],
    )
    assert CuzkMsmEngine(CurveId.BLS12_377)._chunk_for(1 << 18) == 13
    assert CuzkMsmEngine(
        CurveId.BLS12_377, autotune=False
    )._chunk_for(1 << 18) == 15  # static policy


def test_autotune_smvp_selects_persists_and_engine_consults(
    tmp_path, monkeypatch
):
    monkeypatch.setenv("MSM_AUTOTUNE_DIR", str(tmp_path))

    fake = {
        ("stream", None): 0.25,
        ("tree", 1): 0.30,
        ("tree", 2): 0.28,
        ("tree", 3): 0.31,
    }

    def measure(curve, n, chunk, smvp, k, runs):
        assert chunk == 16  # 2^20 static policy feeds the candidates
        return fake[(smvp, k)]

    # tree candidates need a TPU backend; on CPU only stream survives —
    # force all candidates viable by faking support
    monkeypatch.setattr(autotune, "_default_measure_smvp", measure)
    import webgpu_msm_bls12_377_tpu.ops.smvp_stream as smvp_stream
    import webgpu_msm_bls12_377_tpu.ops.smvp_tree as smvp_tree

    monkeypatch.setattr(smvp_tree, "tree_supported", lambda *_: True)
    monkeypatch.setattr(smvp_stream, "stream_supported", lambda *_: True)
    m, k = autotune.autotune_smvp(
        CurveId.BLS12_377, 1 << 20, measure_fn=measure
    )
    assert (m, k) == ("stream", None)

    entry = autotune.lookup_entry(CurveId.BLS12_377, 1 << 20)
    assert entry["smvp"] == "stream" and entry["tree_finish"] is None
    assert entry["smvp_warm_s"]["tree-K2"] == 0.28

    # engine consults: _tree_k honors a tuned finish level; tuned
    # "stream" overrides the static n>=2^18 tree boundary (backend
    # support still gates the final resolution)
    fake2 = dict(fake)
    fake2[("tree", 3)] = 0.01
    m2, k2 = autotune.autotune_smvp(
        CurveId.BLS12_377, 1 << 20, measure_fn=lambda *a: fake2[(a[3], a[4])]
    )
    assert (m2, k2) == ("tree", 3)
    eng = CuzkMsmEngine(CurveId.BLS12_377)
    assert eng._tree_k(1 << 20) == 3
    assert eng._tree_k(1 << 18) == 2  # untuned n: measured default
    # explicit tree_finish still wins over the table
    assert CuzkMsmEngine(
        CurveId.BLS12_377, tree_finish=1
    )._tree_k(1 << 20) == 1
    # autotune=False ignores the table entirely
    assert CuzkMsmEngine(
        CurveId.BLS12_377, autotune=False
    )._tree_k(1 << 20) == 2
