import os
import sys

# Run all tests on a virtual 8-device CPU mesh; the real TPU is only used by
# bench.py. The axon sitecustomize imports jax at interpreter startup, so
# setting env vars here is too late — use jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# PCODEC_TEST_PLATFORM=tpu runs the device (Pallas) tests on real hardware;
# the default CPU mesh covers everything else (kernels interpret-mode only).
_platform = os.environ.get("PCODEC_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
