import os
import sys

# Run all tests on a virtual 8-device CPU mesh; the real TPU is only used by
# bench.py. The axon sitecustomize imports jax at interpreter startup, so
# setting env vars here is too late — use jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
