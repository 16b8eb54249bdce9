"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic (mesh/shard_map/halo exchange) is tested on a
virtual 8-device CPU mesh per SURVEY.md §4; real-TPU runs happen via
bench.py, not the unit suite. Must run before jax is first imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fasthevc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend at interpreter
# startup (before conftest); override back to CPU for the unit suite.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The device-pipeline programs take minutes to XLA-compile per shape on
# this 2-core host; the unit suite exercises the byte-identical classic
# path by default.  The dedicated device-path tests (test_device_commit,
# test_device_inter, test_sharded_pipeline) re-enable the device paths.
os.environ.setdefault("FASTHEVC_FORCE_CLASSIC", "1")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_accumulation():
    """Free in-process XLA executables after each test module.

    A full batch run compiles ~230 distinct programs; letting them all
    accumulate in one CPU client crashed the r4 suite at ~94% with a
    fatal error inside backend_compile_and_load (VERDICT r4 weak #2).
    The persistent on-disk cache (JAX_COMPILATION_CACHE_DIR above) makes
    any cross-module recompiles cheap reloads."""
    yield
    jax.clear_caches()
