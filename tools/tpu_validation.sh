#!/bin/bash
# Hardware validation + measurement sequence for tpu-inspect.
#
# Run when a TPU is reachable (one JAX client at a time — stop any probe
# loops first). Each step writes to $OUT; later steps still run if an
# earlier one fails. Total ~25-35 min.
#
#   bash tools/tpu_validation.sh [outdir]
set -u
OUT="${1:-/tmp/tpu_validation}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name: $* (log: $OUT/$name.log)"
  timeout 1800 "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "rc=$?" >> "$OUT/$name.log"
  tail -2 "$OUT/$name.log"
  cat "$OUT/$name.json" 2>/dev/null | tail -1
}

# 1) headline benchmark (parity-gated; the scoreboard metric)
run bench_main python bench.py
# 2) per-op device breakdown (feeds PERF.md)
run profile python -m tpu_inspect.cli profile --iters 8 --top 20
# 3) whole-image configs
run bench_config1 python bench.py config1
run bench_config1defect python bench.py config1defect
# 4) streaming wall clock (config 5)
run bench_stream python bench.py stream
# 5) hardware kernel suite (Mosaic lowering coverage; ~9 min)
echo "=== tpu_kernels"
TPU_INSPECT_TEST_PLATFORM=tpu timeout 1800 python -m pytest \
  tests/test_tpu_kernels.py -q > "$OUT/tpu_kernels.log" 2>&1
echo "rc=$?" >> "$OUT/tpu_kernels.log"
tail -2 "$OUT/tpu_kernels.log"

echo "=== done; logs in $OUT"
