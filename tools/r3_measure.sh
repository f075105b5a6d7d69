#!/bin/bash
# Round-3 measurement sequence (VERDICT r2 items 1-3, 10). Logs to
# /tmp/r3logs/. Each step under timeout so a tunnel stall can't eat the
# session. Run order: encode trace A/Bs first (round priority #1), then
# decode lever A/Bs, then the full matrix.
mkdir -p /tmp/r3logs
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > /tmp/r3logs/$name.log 2>&1
  echo "rc=$? $(tail -1 /tmp/r3logs/$name.log | head -c 400)"
}

# 1. encode train trace: reconcile the 4.38s-vs-1.1s discrepancy
PCODEC_TRAIN_TRACE=1 run 01_trace python bench.py
# 1b. lookback eval A/B: host sample fetch vs device bins
PCODEC_TRAIN_TRACE=1 PCODEC_LB_HOST=1 run 02_trace_lbhost python bench.py
# 1c. chunk-size A/B
PCODEC_TRAIN_TRACE=1 PCODEC_BENCH_CHUNK_N=$((1<<22)) run 03_trace_chunk4m python bench.py

# 2. ans-cap decode A/B
PCODEC_BENCH_ANS_CAP=7 run 04_anscap7 python bench.py
PCODEC_BENCH_ANS_CAP=8 run 05_anscap8 python bench.py

# 3. lookback recon A/B (wrapped_lookback config only)
PCODEC_BENCH_ONLY=wrapped_lookback run 06_lbrecon_pallas python bench_matrix.py
PCODEC_LB_RECON=xla PCODEC_BENCH_ONLY=wrapped_lookback run 07_lbrecon_xla python bench_matrix.py

# 4. full matrix (all configs)
run 08_matrix python bench_matrix.py

echo "ALL DONE"
