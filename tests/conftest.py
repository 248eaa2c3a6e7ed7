"""Test config: force CPU backend with 8 virtual devices.

Pallas kernels run in interpreter mode on CPU (the interface auto-detects the
backend); sharding/distributed tests get a real 8-device mesh without TPU
hardware — the improvement over the reference's skip-if-fewer-GPUs approach
(tests/models/test_gpt_parallel.py:41) noted in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The machine's axon sitecustomize pins JAX_PLATFORMS=axon; override after
# import so tests always run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite compiles hundreds of kernel configs; without clearing,
    the single pytest process eventually segfaults inside the XLA CPU
    compiler (reproducibly on the last module at ~10GB of retained
    executables). Dropping compiled programs between modules caps memory."""
    yield
    jax.clear_caches()
    gc.collect()
