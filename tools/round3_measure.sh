#!/usr/bin/env bash
# Round-3 TPU re-measurement sequence (run when the relay is back).
#
# Order matters: the remote compiler serializes across processes, so
# steps run strictly one at a time.  Each step tees into
# /tmp/r3_measure/<step>.log; summary JSON lines collect in
# /tmp/r3_measure/summary.jsonl.
#
# Usage: bash tools/round3_measure.sh [step...]   (default: all)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_measure
SUM=/tmp/r3_measure/summary.jsonl

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee /tmp/r3_measure/"$name".log | tail -3
  grep -h '^{' /tmp/r3_measure/"$name".log | tail -1 >> "$SUM" || true
}

steps=${*:-probe bench20 ab_nopair bench16 sweep batch edwards coldcache tpu_tests}

for s in $steps; do case $s in
  probe)
    timeout 90 python tools/probe_tpu_alive.py || exit 1 ;;
  bench20)  # headline: 2^20 BLS12-377, distinct points, goldens
    run bench20 3600 python bench.py --runs 4 ;;
  ab_nopair)  # A/B: pair-REDC off (fresh process => fresh compile)
    run ab_nopair 3600 env MSM_PAIR_REDC=0 MSM_EXEC_CACHE=0 python bench.py --runs 3 ;;
  bench16)
    run bench16 1800 python bench.py --n 65536 --runs 4 ;;
  sweep)  # full power sweep, golden-verified
    run sweep 7200 python -m webgpu_msm_bls12_377_tpu.harness.sweep \
        --powers 16 17 18 19 20 --runs 3 --csv sweep_r3.csv ;;
  batch)  # pipelined batched MSM (BASELINE config 5)
    run batch 3600 python bench.py --batch 8 --runs 1
    run batch_host 3600 python bench.py --batch 8 --batch-host-inputs --runs 1 ;;
  edwards)
    run edwards 3600 python bench.py --curve edwards_bls12 --runs 3 ;;
  coldcache)  # exec-cache cold start: second process should skip compiles
    rm -rf .exec_cache
    run cold_populate 3600 python bench.py --n 65536 --runs 1
    run cold_reload 1800 python bench.py --n 65536 --runs 1 ;;
  tpu_tests)
    run tpu_tests 3600 env MSM_TEST_TPU=1 python -m pytest tests -m tpu -q ;;
  *) echo "unknown step $s" ;;
esac; done

echo "=== summary ==="
cat "$SUM" 2>/dev/null
