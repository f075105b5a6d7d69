#!/bin/bash
# TPU runbook (round 3): the standing hardware validation sequence.
# Run pieces individually; everything is timeout-guarded (the axon tunnel
# can hang indefinitely — NOTES.md).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# 1. headline bench: decode GB/s + FULL end-to-end image encode GB/s, both
#    full-width bit-verified on device (decode vs uploaded source; encode
#    image vs the host encoder's file)
timeout 3000 python bench.py 2>&1 | tail -3

# 2. decision-path A/B on hardware (all byte-identical; see NOTES):
#    device decisions (default) vs full host-native decisions
PCODEC_TRAIN_TRACE=1 timeout 2400 python bench.py 2>&1 | tail -30
PCODEC_TRAIN_TRACE=1 PCODEC_HOST_DECIDE=1 timeout 2400 python bench.py 2>&1 | tail -30

# 3. the matrix (8 configs incl. realistic-ratio) -> BENCH_MATRIX_r03.json
timeout 3000 python bench_matrix.py 2>&1 | tail -10

# 4. device encode + train byte-identity suites on the real chip
for f in "test_pallas_encode.py::TestDeviceTrain" \
         "test_pallas_encode.py::TestDeviceEncode" \
         test_pallas_container test_device_decode test_standalone_pallas \
         test_device_lookback_conv1; do
  PCODEC_TEST_PLATFORM=tpu timeout 3500 python -m pytest "tests/$f" -q \
    2>&1 | tail -2
done
