import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): multi-chip
# sharding paths compile and execute without TPU hardware.  NOTE: in this
# container a sitecustomize force-registers a TPU plugin and pins
# JAX_PLATFORMS in the env, so the env-var route is not enough — the config
# must be updated post-import, before first backend use.
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older flag spelling already covered by XLA_FLAGS

# fp32 parity tests need true fp32 matmuls: JAX's "default" matmul precision
# is bf16-grade on both CPU (oneDNN) and TPU (MXU passes).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
