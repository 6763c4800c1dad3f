"""Benchmark + test-data harness (the reference's L5/L6 layers as CLIs).

- sweep: full_benchmarks.ts-style power sweep with cold/warm protocol
- microbench: per-op field/point kernel timings (mont-mul table parity)
- testdata: generate/save/load test cases and golden vectors
"""

from .testdata import (  # noqa: F401
    TestCase,
    generate_points,
    load_test_case,
    make_test_case,
    save_test_case,
)
