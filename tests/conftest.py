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
if os.environ.get("AUTOGP_TEST_TPU") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
else:
    from autogp_tpu.utils.jax_cache import cpu_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      cpu_cache_dir("/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (compile-heavy SMC/HMC "
        "programs); deselect with -m 'not slow' for the <12-min fast path")
