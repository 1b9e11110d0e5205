"""Force an 8-device virtual CPU platform for the test suite.

Sharding/collective tests run on host devices (SURVEY §4: the reference
cannot test its distributed paths without GPUs; we can).

NOTE: this environment pre-imports jax via a sitecustomize that pins the
"axon" TPU platform, so env vars alone are ignored — the platform must be
switched through jax.config BEFORE the first backend initialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"


# machine-keyed cache dir (see utils/env.py::machine_cache_dir on why:
# cross-machine AOT cache blobs can compute garbage after a VM migration)
from efficient_slowfast_tpu.utils.env import machine_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      machine_cache_dir("/tmp/jax_test_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as _jnp  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert jax.device_count() >= 8, "tests need 8 virtual CPU devices"
_jnp.zeros(1).block_until_ready()  # init XLA CPU before torch's OpenMP

import torch  # noqa: E402

# torch's OpenMP pool can deadlock against XLA's thread pool on small hosts;
# single-thread torch (it is only used for golden-value references).
torch.set_num_threads(1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
