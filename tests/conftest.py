"""Test configuration.

Forces JAX onto the host CPU backend with 8 virtual devices *before* jax
initializes, so multi-chip sharding/collective tests run without TPU hardware
(the fake-backend idiom from SURVEY.md §4).  Bench/production paths pick the
real TPU when run outside pytest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some images pre-import jax from sitecustomize with a hardware platform
# pinned; jax.config wins over the (already-captured) env in that case.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: the XLA_FLAGS path above covers it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
