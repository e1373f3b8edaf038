"""Test configuration: CPU backend, 8 virtual devices, float64.

Numerical-parity tests against the Julia reference semantics run in float64
on CPU; multi-device sharding tests use the 8 virtual host devices
(SURVEY.md §4 testing strategy).

Note: the ambient environment registers a remote-TPU ("axon") backend via
sitecustomize and forces jax_platforms to it through jax.config — so we
must override through jax.config too, not just JAX_PLATFORMS.
Set AUTOGP_TEST_TPU=1 to run the suite against the TPU instead.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("AUTOGP_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# (TPU mode stays float32: x64 would disable the Pallas kernels under
# test in tests/test_tpu_kernels.py.)

# Persistent compilation cache: the suite compiles a few dozen sizable XLA
# programs (SMC rounds, HMC scans); caching them across runs cuts the suite
# from ~15min to ~2min on re-runs. CPU runs use a host-fingerprinted
# subdirectory: the shared root also receives XLA:CPU AOT artifacts from
# OTHER machines (the grading driver's dryrun subprocess), and
# deserializing a foreign host's CPU executable SIGILLs mid-suite (see
# autogp_tpu/utils/jax_cache.py).
_cache_root = os.environ.get("AUTOGP_TEST_CACHE_DIR", "/root/repo/.jax_cache")
if os.environ.get("AUTOGP_TEST_TPU") == "1":
    jax.config.update("jax_compilation_cache_dir", _cache_root)
else:
    from autogp_tpu.utils.jax_cache import cpu_cache_dir
    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(_cache_root))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (compile-heavy SMC/HMC "
        "programs); deselect with -m 'not slow' for the <12-min fast path")


_last_module = [None]


def pytest_runtest_setup(item):
    # Drop in-memory jit executables at module boundaries. A full
    # single-process run accumulates hundreds of live XLA:CPU executables;
    # past ~200 tests the process segfaulted inside the persistent-cache
    # serialize/deserialize calls (r3: get_executable_and_time at ~89%;
    # r4: put_executable_and_time at ~78% — both only late in the run,
    # while the same compiles in a fresh process succeed). Bounding live
    # executables keeps the process in the regime where cache I/O is
    # reliable; re-runs of shared programs re-trace and hit the
    # persistent cache, so the time cost is small.
    mod = item.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
