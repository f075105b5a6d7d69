#!/bin/bash
# Runbook for when the axon tunnel recovers. Run pieces individually.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# 1. float-mode + specials + TRY_DICT device encode tests (NEW this round)
PCODEC_TEST_PLATFORM=tpu timeout 3000 python -m pytest \
  "tests/test_pallas_encode.py::TestDeviceTrain" -q \
  2>&1 | tail -3

# 2. encode bench with phase trace (twice: cold + spec-hint warm);
#    A/B the lookback eval: device bins (default) vs host sample fetch
PCODEC_TRAIN_TRACE=1 timeout 1200 python bench.py 2>&1 | tail -25
PCODEC_TRAIN_TRACE=1 PCODEC_LB_HOST=1 timeout 1200 python bench.py 2>&1 | tail -25
# 2a. chunk-size A/B for encode train (fewer chunks = less host work)
PCODEC_TRAIN_TRACE=1 PCODEC_BENCH_CHUNK_N=$((1<<22)) timeout 1200 python bench.py 2>&1 | tail -25

# 2b. ans-cap TPU profile: expect decode well above 5.06 GB/s (select trees
# shrink 8x at cap 7 for +0.01% size); flip the bench default if it wins
PCODEC_BENCH_ANS_CAP=7 timeout 1200 python bench.py 2>&1 | tail -3
PCODEC_BENCH_ANS_CAP=8 timeout 1200 python bench.py 2>&1 | tail -3

# 2c. lookback reconstruction A/B: Pallas lane-gather kernel (default) vs
# XLA pointer doubling — compare the wrapped-lookback config's decode GB/s
PCODEC_BENCH_ONLY=wrapped_lookback timeout 1200 python bench_matrix.py 2>&1 | tail -3
PCODEC_LB_RECON=xla PCODEC_BENCH_ONLY=wrapped_lookback timeout 1200 python bench_matrix.py 2>&1 | tail -3

# 3. five-config matrix -> BENCH_MATRIX_r02.json
timeout 3000 python bench_matrix.py 2>&1 | tail -10

# 4. full TPU matrix refresh (shard by file)
for f in test_pallas_container test_device_decode test_standalone_pallas \
         test_device_lookback_conv1 test_pallas_encode; do
  PCODEC_TEST_PLATFORM=tpu timeout 3000 python -m pytest "tests/$f.py" -q \
    2>&1 | tail -2
done
